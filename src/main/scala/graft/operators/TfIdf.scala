package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sparse-vector document similarity: TF-IDF cosine over
  * word n-gram terms with a PROVABLE weight-ordered prefix filter
  * (the all-pairs similarity search idea of Bayardo et al., WWW'07,
  * adapted to a join-based plan).
  *
  * Complements the X1 set-similarity family: Jaccard treats every
  * shared shingle equally; TF-IDF cosine weights shared terms by
  * rarity and term frequency, the similarity retrieval/linkage
  * pipelines actually rank with.
  *
  * Exact-integer discipline (the repo-wide rule for cross-engine
  * hashes): `ln(N/df)` is libm-dependent and NOT bit-stable across
  * engines, so the IDF is the integer reciprocal `IdfScale div df` —
  * monotone-decreasing in df like any IDF, exactly representable, and
  * reproducible in ANSI SQL. Weights, dots, and squared norms are
  * all BIGINT; floats appear only in the final
  * `dot / (sqrt(n2a)·sqrt(n2b))` where sqrt/mul/div are IEEE
  * correctly-rounded and therefore engine-identical.
  *
  * Scale shape: term weights are one explode + two hash aggregates;
  * candidate generation joins each doc's PREFIX terms (rare-first
  * until the remaining tail's unit-norm² drops below t²) against the
  * full posting list — O(Σ_prefix-term df), never O(docs²); the
  * verify join touches candidate pairs only. Soundness of the prune
  * (TfIdfSpec pins it on real data): order a doc's terms rare-first
  * and let tail²(p) = Σ_{q≥p} u_q² of the unit vector. If a pair
  * shares NO prefix term of `a`, its shared terms all sit in `a`'s
  * excluded tail, so by Cauchy-Schwarz
  * cos(a,b) = Σ_S u_a·u_b ≤ sqrt(Σ_S u_a²) ≤ sqrt(tail²) < t —
  * the pair can never qualify. ε=1e-9 pads the float boundary.
  *
  * Reference analogue: none (scrapper.py has no similarity surface);
  * engine completeness for the north-star LLM-pipeline inventory.
  */
object TfIdf {
  val IdfScale = 100000L

  /** (id, tok, w, df) integer term weights: tok = word n-gram WITH
    * multiplicity (tf counts repeats — unlike the distinct-shingle
    * Jaccard ops), w = tf · (IdfScale div df). Docs shorter than n
    * tokens carry no terms and never pair. */
  def weights(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), graft.functions.TextAnalysis.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
    val tf = toks
      .select(col("id"), explode(transform(sequence(lit(0), size(col("w")) - n),
        i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "tok")
      .select(col("id"), col("tok"), expr(s"tf * ($IdfScale div df)").as("w"), col("df"))
  }

  /** All pairs with TF-IDF cosine ≥ simT, exactly (prefix filter is
    * lossless; spec-pinned equal to the quadratic baseline). Output:
    * (idA, idB, dot, n2a, n2b) with idA < idB — integer evidence
    * columns; callers derive the float cosine once, at the edge. */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, simT: Double = 0.5): DataFrame =
    // materialize the term-weight table ONCE: norms, prefix selection,
    // candidate postings, and the verify join all read it, and without
    // truncation each consumer would re-run the explode + two
    // aggregates (measured 8.3 s → ~3 s at sf0.1). At corpus scale
    // this is the persisted artifact (the weighted inverted index) —
    // the same build-once/probe-many split the text index uses;
    // callers with a PERSISTED weight table (x1_tfidf_pairs) enter at
    // `cosinePairsFromWeights` and skip the build entirely.
    cosinePairsFromWeights(
      weights(docs, idCol, textCol, n).localCheckpoint(true), simT)

  /** The search itself, over an already-materialized (id, tok, w, df)
    * weight table — the entry point for consumers that persist the
    * weighted inverted index and probe it warm. */
  def cosinePairsFromWeights(wt: DataFrame, simT: Double): DataFrame = {
    val n2 = wt.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))
    val wtn = wt.join(n2, "id")
    // rare-first tail norm² of the UNIT vector; prefix = rows whose
    // tail (themselves included) still carries ≥ t² of the mass
    val tail = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("tok").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = wtn
      .withColumn("tail2",
        sum((col("w") * col("w")).cast("double") / col("n2")).over(tail))
      .filter(col("tail2") >= simT * simT - 1e-9)
      .select(col("id").as("idP"), col("tok"))
    // prefix terms × full postings: a qualifying pair shares a prefix
    // term of at least one side, so the union of both orientations of
    // this join covers it; normalize to idA < idB and dedup
    val cands = prefix.join(wt.select(col("id").as("idQ"), col("tok")), "tok")
      .filter(col("idP") =!= col("idQ"))
      .select(least(col("idP"), col("idQ")).as("idA"),
        greatest(col("idP"), col("idQ")).as("idB"))
      .distinct()
    verifyCosine(cands, wtn, simT)
  }

  /** Quadratic baseline (spec oracle only): every co-term pair. */
  def cosinePairsAllPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, simT: Double = 0.5): DataFrame = {
    val wt = weights(docs, idCol, textCol, n)
    val n2 = wt.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))
    val wtn = wt.join(n2, "id")
    val cands = wt.select(col("id").as("idA"), col("tok"))
      .join(wt.select(col("id").as("idB"), col("tok")), "tok")
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    verifyCosine(cands, wtn, simT)
  }

  /** Exact-integer verify: dot over shared terms, then ONE float
    * comparison dot/(√n2a·√n2b) ≥ t. The filter reuses the same
    * expression the caller renders, so qualification and the reported
    * value can never disagree. (A sparse-vector-as-map variant —
    * map_zip_with dot per pair — measured SLOWER here: 7.1 s vs
    * 4.1 s on 0.5 M candidates at sf0.1; per-pair string-keyed map
    * materialization beats the per-term shuffle only when terms/doc
    * greatly exceeds this corpus's ~50.) */
  private def verifyCosine(cands: DataFrame, wtn: DataFrame, simT: Double): DataFrame = {
    val a = wtn.select(col("id").as("idA"), col("tok"), col("w").as("wA"), col("n2").as("n2a"))
    val b = wtn.select(col("id").as("idB"), col("tok"), col("w").as("wB"), col("n2").as("n2b"))
    cands.join(a, "idA").join(b, Seq("idB", "tok"))
      .groupBy(col("idA"), col("idB"), col("n2a"), col("n2b"))
      .agg(sum(col("wA") * col("wB")).as("dot"))
      .filter(col("dot").cast("double") /
        (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))) >= simT)
      .select(col("idA"), col("idB"), col("dot"), col("n2a"), col("n2b"))
  }
}
