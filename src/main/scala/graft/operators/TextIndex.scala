package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens

/** Persisted inverted text index — build-once / probe-many keyword
  * search (SURVEY §2 X3), the text sibling of the persisted ANN/IVF
  * vector indexes.
  *
  * Build (one corpus scan, once per corpus version):
  *   - `<name>_postings` (term, doc_id, tf) — range-clustered and
  *     sorted by term, so every probe's `term IN (...)` predicate
  *     skips non-matching files/row-groups via parquet min/max stats;
  *   - `<name>_df` (term, df) — document frequency per term;
  *   - `<name>_stats` (n_docs) — corpus size for the idf weight.
  *
  * Probe (per query): read ONLY the probed terms' postings (pushed
  * scan filter over the sorted layout), broadcast-join the df rows
  * (bytes), aggregate a tf·idf score per doc, top-k. Nothing
  * corpus-sized shuffles at query time — at 100 TB the per-query cost
  * is proportional to the probed terms' posting lists, which is the
  * whole point of an inverted index. The idf weight is integer-scaled
  * ((N·1000) div df) so scoring is exact integer arithmetic,
  * cross-engine stable.
  */
object TextIndex {

  /** One corpus scan → postings + df + per-doc-length + stats tables
    * in `store`. The doclen table (doc_id, dl) and the corpus token
    * total exist for length-normalized (BM25-style) scoring; plain
    * tf·idf ignores them. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      store: TableStore, name: String, numFiles: Int = 8): Unit = {
    val spark = docs.sparkSession
    // tokenize + explode happens ONCE: the POSITIONAL postings land
    // first (term, doc_id, pos — the phrase-query substrate), and
    // every derived table (tf postings, df, doclen, stats) reads back
    // the just-committed parquet instead of re-running the corpus
    // scan — without this, five actions over the same lineage would
    // recompute the corpus tokenization five times.
    val pos = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    store.replace(spark, s"${name}_pos",
      pos.repartitionByRange(numFiles, col("term")).sortWithinPartitions("term"))
    val posTable = store.read(spark, s"${name}_pos")
    store.replace(spark, s"${name}_postings",
      posTable.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        .repartitionByRange(numFiles, col("term")).sortWithinPartitions("term"))
    val posted = store.read(spark, s"${name}_postings")
    store.replace(spark, s"${name}_df",
      posted.groupBy("term").agg(count(lit(1)).as("df")))
    // doclen carries EVERY indexed doc, token-less ones at dl=0: the
    // doclen table doubles as the index's doc-id registry (fold's
    // duplicate check reads it), so a doc whose text tokenizes to
    // nothing must still leave a row — otherwise refolding it would
    // pass the overlap check and double-count n_docs, skewing
    // idf/avgdl. dl=0 rows never join a probe (no postings) and add
    // nothing to total_tokens, so scores are unchanged.
    store.replace(spark, s"${name}_doclen",
      docs.select(col(idCol).as("doc_id"))
        .join(posted.groupBy("doc_id").agg(sum(col("tf")).as("dl")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl")))
    // n_docs counts ALL docs (token-less docs too — they're corpus
    // members for idf purposes even though they have no posting)
    store.replace(spark, s"${name}_stats",
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(store.read(spark, s"${name}_doclen")
          .agg(sum(col("dl")).as("total_tokens"))))
  }

  /** Incremental maintenance: fold a batch of NEW docs into an
    * existing index as a Lucene-style SEGMENT — O(batch) work, the
    * base postings are never rewritten. The batch's postings, doclen,
    * df, and stats land in segment-local tables
    * (`<name>_{postings,doclen,df,stats}_s<k>`), and the segment id is
    * PUBLISHED LAST via the `<name>_segs` table: probes aggregate
    * base + published segments (df/stats are additive; postings and
    * doclen union), so an unpublished half-written fold is invisible
    * and retrying the fold overwrites its orphan tables under the
    * same id before publishing — each table commit is the store's
    * atomic rename, and publication is the single commit point.
    * Batch ids must be NEW (checked against the published doc set —
    * replacing a doc means delete + refold, out of scope); rebuilding
    * from scratch IS segment compaction. */
  def fold(docs: DataFrame, idCol: String, textCol: String,
      store: TableStore, name: String, numFiles: Int = 4): Unit = {
    val spark = docs.sparkSession
    val overlap = docs.select(col(idCol).as("doc_id"))
      .join(doclenAll(spark, store, name).select("doc_id"), Seq("doc_id"), "left_semi")
      .count()
    require(overlap == 0, s"fold: $overlap doc ids already indexed in '$name'")
    val seg = nextSeg(spark, store, name)
    val pos = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    store.replace(spark, s"${name}_pos_s$seg",
      pos.repartitionByRange(numFiles, col("term")).sortWithinPartitions("term"))
    store.replace(spark, s"${name}_postings_s$seg",
      store.read(spark, s"${name}_pos_s$seg")
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        .repartitionByRange(numFiles, col("term")).sortWithinPartitions("term"))
    val posted = store.read(spark, s"${name}_postings_s$seg")
    // same dl=0 registry contract as build(): every batch doc leaves
    // a doclen row, so the NEXT fold's overlap check sees it
    store.replace(spark, s"${name}_doclen_s$seg",
      docs.select(col(idCol).as("doc_id"))
        .join(posted.groupBy("doc_id").agg(sum(col("tf")).as("dl")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl")))
    store.replace(spark, s"${name}_df_s$seg",
      posted.groupBy("term").agg(count(lit(1)).as("df")))
    store.replace(spark, s"${name}_stats_s$seg",
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(store.read(spark, s"${name}_doclen_s$seg")
          .agg(coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))))
    val segRow = spark.range(1).select(lit(seg).as("seg"))
    store.replace(spark, s"${name}_segs",
      if (store.exists(spark, s"${name}_segs"))
        store.read(spark, s"${name}_segs").unionByName(segRow)
      else segRow)
  }

  /** Erasure — the GDPR path for the TEXT index (Ivf.remove's
    * sibling): an erased document must stop being SERVABLE without
    * rewriting the term-range-partitioned postings. Lucene's model,
    * made exact: the cumulative TOMBSTONE set commits as ONE table
    * (`<name>_dels`, a single atomic manifest swap — crash-safe and
    * the single source of truth), and every probe reconstructs exact
    * surviving-corpus semantics from it: candidates anti-join the
    * tombstones, per-term df is DERIVED from the surviving probed
    * postings (identical to the stored df when nothing is tombstoned),
    * and the corpus stats subtract the tombstoned registry rows — so
    * post-erasure scores are bit-identical to an index rebuilt on the
    * survivors (TextIndexSpec pins it), not Lucene's drift-until-merge
    * approximation. Probe overhead is one broadcast anti-join plus a
    * tombstone-pruned doclen scan; delete cost is O(delete set).
    * Idempotent: already-tombstoned or never-indexed ids are no-ops
    * (returns the NEWLY tombstoned count). A tombstoned id cannot be
    * re-folded — the registry keeps its row so the overlap check
    * refuses; rebuilding from scratch IS compaction and clears
    * tombstones. */
  def remove(spark: SparkSession, store: TableStore, name: String,
      ids: DataFrame, idCol: String): Long = {
    val del = ids.select(col(idCol).as("doc_id")).distinct()
    // CAS commit with bounded retry (ADVICE r10): the read-modify-write
    // of the cumulative tombstone set must not be last-writer-wins — two
    // concurrent erasure callers silently dropping one's tombstones is a
    // compliance-grade hazard. The base version is captured at read
    // time; replaceIfUnchanged aborts if a concurrent eraser committed
    // in between, and the loop recomputes from the fresh set (cheap —
    // delete-set-sized) and retries. remove is idempotent, so a retry
    // can never double-delete.
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val baseVer = store.currentVersionId(spark, s"${name}_dels")
      val indexed = del.join(doclenAll(spark, store, name).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val existing = delsAll(spark, store, name)
      val fresh = existing.fold(indexed)(d =>
        indexed.join(d, Seq("doc_id"), "left_anti"))
      val n = fresh.count()
      if (n == 0L) return 0L
      try {
        store.replaceIfUnchanged(spark, s"${name}_dels",
          existing.fold(fresh)(_.unionByName(fresh).distinct()), baseVer)
        return n
      } catch {
        case _: java.util.ConcurrentModificationException if attempts < 5 =>
      }
    }
    throw new IllegalStateException(
      s"remove: lost the ${name}_dels commit race 5 times — erasure storm? retry")
  }

  /** The committed tombstone set, if any erasure ever ran. */
  private def delsAll(spark: SparkSession, store: TableStore,
      name: String): Option[DataFrame] =
    if (store.exists(spark, s"${name}_dels"))
      Some(store.read(spark, s"${name}_dels").select("doc_id"))
    else None

  /** Probe-side surviving views for `terms`: (postings, df, stats) with
    * tombstoned docs dropped and df/stats corrected to exact
    * surviving-corpus values. With no tombstones this returns the
    * stored tables' frames unchanged (df from the stored additive
    * tables — no extra work on the common path). */
  private def survivingViews(spark: SparkSession, store: TableStore, name: String,
      terms: Seq[String]): (DataFrame, DataFrame, DataFrame) = {
    val post0 = unionAll(spark, store, name, "postings").filter(col("term").isin(terms: _*))
    delsAll(spark, store, name) match {
      case None =>
        (post0, dfAll(spark, store, name, terms), statsAll(spark, store, name))
      case Some(d) =>
        val post = post0.join(broadcast(d), Seq("doc_id"), "left_anti")
        // df over the SURVIVING probed postings: one (term, doc) row
        // per containing doc across base+segments (fold forbids
        // duplicate ids), so the count IS the surviving df
        val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
        val delStats = doclenAll(spark, store, name)
          .join(broadcast(d), Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("dn"), coalesce(sum(col("dl")), lit(0L)).as("dt"))
        val stats = statsAll(spark, store, name).crossJoin(broadcast(delStats))
          .select((col("n_docs") - col("dn")).as("n_docs"),
            (col("total_tokens") - col("dt")).as("total_tokens"))
        (post, dfreq, stats)
    }
  }

  /** Positional rows for one term with tombstoned docs dropped. */
  private def survivingPos(spark: SparkSession, store: TableStore, name: String,
      term: String): DataFrame = {
    val p = unionAll(spark, store, name, "pos").filter(col("term") === term)
    delsAll(spark, store, name).fold(p)(d =>
      p.join(broadcast(d), Seq("doc_id"), "left_anti"))
  }

  /** Published segment ids (empty for a never-folded index). The
    * driver-side collect is segment-count-bounded — folds per
    * compaction cycle, not corpus size. */
  private def segIds(spark: SparkSession, store: TableStore, name: String): Seq[Int] =
    if (!store.exists(spark, s"${name}_segs")) Seq.empty
    else store.read(spark, s"${name}_segs").collect().map(_.getInt(0)).toSeq.sorted

  private def nextSeg(spark: SparkSession, store: TableStore, name: String): Int =
    segIds(spark, store, name).lastOption.map(_ + 1).getOrElse(1)

  private def unionAll(spark: SparkSession, store: TableStore, name: String,
      table: String): DataFrame =
    segIds(spark, store, name)
      .map(k => store.read(spark, s"${name}_${table}_s$k"))
      .foldLeft(store.read(spark, s"${name}_$table"))(_ unionByName _)

  private def doclenAll(spark: SparkSession, store: TableStore, name: String): DataFrame =
    unionAll(spark, store, name, "doclen")

  /** df across base + segments for the probed terms: each table's
    * term filter pushes to its scan; the sum touches probed-term rows
    * only. */
  private def dfAll(spark: SparkSession, store: TableStore, name: String,
      terms: Seq[String]): DataFrame =
    unionAll(spark, store, name, "df").filter(col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("df")).as("df"))

  private def statsAll(spark: SparkSession, store: TableStore, name: String): DataFrame =
    unionAll(spark, store, name, "stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_tokens")).as("total_tokens"))

  /** Top-k docs by BM25-shaped score (k1=1.2, b=0.75) over the probed
    * terms: the classic saturating-tf, length-normalized ranking that
    * separates "mentions the term" from "is about the term". The idf
    * weight stays integer-scaled ((N·1000) div df); the per-term score
    * is ONE deterministic IEEE expression over exact integer inputs
    * (tf, dl, N, total tokens), rounded to a scaled BIGINT before the
    * per-doc SUM — so the aggregate is exact integer addition and
    * hash-matches across engines regardless of aggregation order
    * (a raw double sum over terms would be order-sensitive). Extra
    * cost vs `search`: one join against the narrow doclen table,
    * keyed on the candidate docs only. */
  def bm25Search(spark: SparkSession, store: TableStore, name: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one probe term")
    val (post, dfreq, stats) = survivingViews(spark, store, name, terms)
    val doclen = doclenAll(spark, store, name)
    post.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(doclen, Seq("doc_id"))
      .withColumn("w", expr("(n_docs * 1000) div df"))
      // keep this expression tree IDENTICAL to the oracle SQL's
      .withColumn("ts", expr(
        "CAST(ROUND(CAST(w AS DOUBLE) * CAST(tf AS DOUBLE) * 2.2 / " +
          "(CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) * " +
          "CAST(n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))) * 1000000.0) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum(col("ts")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Batched BM25 probe — `bm25Search` amortized across a query
    * BATCH, the text sibling of the batched IVF/ADC/SQ funnels: one
    * pass over the union of all queries' posting lists serves every
    * query, instead of |batch| separate index reads. `queries` is a
    * (q_id: long, term: string) frame, query-batch-sized by contract
    * (a serving batch, never a corpus). The distinct term set is
    * collected (bounded by |batch|·terms-per-query — the probe-cid
    * class) so the term filter PUSHES into the term-sorted postings
    * scan; the tiny query frame then broadcasts onto the survivors to
    * fan scores out per query. Scoring is the exact integer-rounded
    * expression of `bm25Search` (same oracle algebra); the per-query
    * ranking window partitions BY QUERY over that query's candidates
    * — bounded by its terms' posting lists, nothing corpus-sized
    * sorts. Returns every scored (q_id, doc_id) candidate UNRANKED so
    * callers can apply their own exclusions before ranking (e.g.
    * hard-negative mining drops near-dup cluster-mates first — a
    * pre-baked rank would leave gaps). */
  def bm25SearchBatch(spark: SparkSession, store: TableStore, name: String,
      queries: DataFrame): DataFrame = {
    val terms = queries.select("term").distinct()
      .collect().map(_.getString(0)).toSeq // bounded: |batch|·terms/query
    require(terms.nonEmpty, "need at least one probe term")
    val (post, dfreq, stats) = survivingViews(spark, store, name, terms)
    val doclen = doclenAll(spark, store, name)
    post.join(broadcast(queries), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(doclen, Seq("doc_id"))
      .withColumn("w", expr("(n_docs * 1000) div df"))
      // keep this expression tree IDENTICAL to bm25Search / the oracle
      .withColumn("ts", expr(
        "CAST(ROUND(CAST(w AS DOUBLE) * CAST(tf AS DOUBLE) * 2.2 / " +
          "(CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) * " +
          "CAST(n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))) * 1000000.0) AS BIGINT)"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("ts")).as("score"), count(lit(1)).as("n_terms"))
  }

  /** Phrase query over the POSITIONAL postings — the IR-textbook
    * positional intersection: each phrase term's leg reads ONLY that
    * term's (doc_id, pos) rows (pushed scan filter over the
    * term-sorted layout), normalizes to the phrase start position
    * (pos − i), and the legs equi-join on (doc_id, start) — a row
    * survives exactly when all terms sit adjacent in order.
    * Overlapping occurrences count individually. Per-query cost is
    * proportional to the probed terms' posting lists at any corpus
    * size; nothing corpus-sized shuffles. */
  def phraseSearch(spark: SparkSession, store: TableStore, name: String,
      phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two terms")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      survivingPos(spark, store, name, t)
        .select(col("doc_id"), (col("pos") - i).as("p0"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "p0")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(k)
  }

  /** Proximity query: docs where `a` and `b` occur within `window`
    * positions (either order), with the pair count and the closest
    * distance. Same two-leg positional read as `phraseSearch`; the
    * per-doc join is bounded by the two terms' posting sizes, the
    * |Δpos| ≤ window filter applies post-join — no corpus-sized work
    * at query time. */
  def nearSearch(spark: SparkSession, store: TableStore, name: String,
      a: String, b: String, window: Int, k: Int): DataFrame = {
    val pa = survivingPos(spark, store, name, a)
      .select(col("doc_id"), col("pos").as("pa"))
    val pb = survivingPos(spark, store, name, b)
      .select(col("doc_id"), col("pos").as("pb"))
    pa.join(pb, Seq("doc_id"))
      .withColumn("d", abs(col("pa") - col("pb")))
      .filter(col("d") <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), min(col("d")).cast("long").as("min_dist"))
      .orderBy(col("n_pairs").desc, col("doc_id"))
      .limit(k)
  }

  /** Top-k docs by integer-scaled tf·idf over the probed terms. */
  def search(spark: SparkSession, store: TableStore, name: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one probe term")
    val (post, dfreq, n) = survivingViews(spark, store, name, terms)
    post.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("w", expr("(n_docs * 1000) div df"))
      .groupBy("doc_id")
      .agg(sum(expr("tf * w")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
