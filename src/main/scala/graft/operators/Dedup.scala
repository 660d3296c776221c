package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators (SURVEY §2 X1; north-star
  * LLM-pipeline ops): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * All shingling/hashing is built from codegen'd higher-order
  * expressions (`transform`/`sequence`/`array_min`/`xxhash64`) — no
  * UDFs, so whole-stage codegen spans the hot path and the same plan
  * scales from 500 docs to 100 TB:
  *
  *  - exact + signature computation: embarrassingly parallel per row;
  *  - LSH candidate generation: one explode (×bands) + one shuffle on
  *    (band, hash) — cost O(docs × bands), never O(docs²);
  *  - only the verify step touches pairs, and only LSH-candidate
  *    pairs, which for a sane threshold is ~O(true duplicates).
  *
  * The all-pairs variants exist as small-scale oracles/baselines; at
  * scale you run the LSH path, which produces identical output when
  * band parameters give negligible false-negative probability.
  */
object Dedup {

  /** Distinct word n-grams ("shingles") of a text column — the
    * codegen'd single-pass `WordNgramsExpr` (WordNgramsSpec pins it
    * equal to the HOF baseline below). Callers must have registered
    * graft's functions on the session; every DataFrame-level entry
    * point in this object does so itself. */
  def wordGrams(text: Column, n: Int): Column =
    call_function("word_ngrams", text, lit(n))

  /** HOF baseline for `wordGrams` (spec oracle): higher-order
    * functions run interpreted, and each consumer re-evaluates the
    * whole pipeline — the reason the expression form exists. Within
    * the HOF, the token array is bound ONCE as a lambda variable (the
    * one-element outer `transform`): naively referencing a `split(...)`
    * Column from inside the gram lambda inlines the split expression
    * into every `element_at` — Catalyst does no CSE inside interpreted
    * HOF lambdas — turning shingling O(words) into O(words²·n)
    * (measured 18s → <1s for 5000 docs at sf0.1). */
  def wordGramsHof(text: Column, n: Int): Column =
    element_at(
      transform(array(split(trim(text), "\\s+")), w =>
        array_distinct(
          when(size(w) >= n,
            transform(sequence(lit(0), size(w) - n),
              i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
            .otherwise(array(concat_ws(" ", w))))),
      1)

  /** MinHash signature per doc as ONE array<long> column, computed by
    * the codegen'd single-pass `MinHashSigExpr` — a scan-local
    * projection with no explode/shuffle/aggregate in the signature
    * stage (MinHashSigSpec pins it equal to the relational form
    * below, element by element). */
  def minhashSig(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    docs.select(col(idCol).as("id"),
      call_function("minhash_sig", col(textCol), lit(n), lit(k)).as("sig"))
  }

  /** Relational baseline for `minhashSig`: one row per doc, k columns
    * m0..m{k-1} where m_i = min over shingles of xxhash64(shingle, i).
    *
    * Explode shingles once, then a single hash-aggregate with k `min`
    * accumulators — rather than nested `transform`/`array_min`
    * lambdas: higher-order functions are interpreted (no codegen) and
    * Catalyst inlines the whole shingling pipeline into every lambda,
    * turning k×bands into a multiplicative re-evaluation. The
    * aggregate form hashes each shingle exactly k times inside
    * whole-stage codegen, and `min` gets map-side partial aggregation,
    * so the only shuffle carries one k-column row per doc. Kept as the
    * expression's spec oracle. */
  def minhashTableRelational(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // Hash the (variable-length) shingle string ONCE to a 64-bit value,
    // then derive the k per-seed hashes from that long — hashing 8
    // fixed bytes k times instead of re-hashing the string k times
    // (~2-3× on the signature stage, which dominates LSH cost).
    // wordGramsHof, not the expression: this baseline is the spec
    // oracle for MinHashSigExpr and must not share code with it
    val grams = docs
      .select(col(idCol).as("id"), explode(wordGramsHof(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
    val mins = Seq.tabulate(k)(i => min(xxhash64(col("gh"), lit(i))).as(s"m$i"))
    grams.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Candidate near-duplicate pairs via MinHash-LSH: docs sharing at
    * least one band bucket (band hash = xxhash64 of its row columns).
    * Output: (idA, idB) with idA < idB, deduplicated. Work is
    * O(docs × bands); the only pairwise step is the equi-join on
    * (band, h), which touches colliding docs only. */
  /** Per-doc LSH band keys (id, band, h) — the rows a persisted
    * bucket index stores, and the probe side of an incremental
    * near-dup check (t10_stream_neardup). Signature depends only on
    * the text, so band keys computed batch-by-batch equal the
    * one-shot computation — incremental candidate generation is
    * exactly the one-shot candidate set. */
  def bandBuckets(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "signature length must divide into bands")
    val r = k / bands
    val sig = minhashSig(docs, idCol, textCol, n, k)
    // band hash over an array SLICE: xxhash64 folds array elements with
    // the running seed exactly like a flat argument list, so
    // xxhash64(slice(sig, b·r+1, r), b) equals the relational form's
    // xxhash64(m_{b·r}, …, m_{b·r+r−1}, b) — no need to unpack the
    // signature into k columns (which would re-evaluate the signature
    // expression per column after projection collapse).
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * r + 1, r), lit(b)).as("h"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  /** ENGINE-PORTABLE band keys (id, band, h: String), at ONE digest
    * per gram: x = the first 15 hex chars of md5(gram) as a 60-bit
    * int (Spark `conv` == DuckDB `CAST('0x'||… AS BIGINT)`, verified
    * value-identical), folded to x mod p (p = 2³¹−1), then the k
    * per-seed values derive ARITHMETICALLY — h_s = (A_s·x + B_s) mod
    * p, a universal linear family with fixed constants — so the only
    * digest work is one md5 per gram (the first cut took min over
    * md5("{seed}_{gram}") per seed: 64 digests per gram, and the
    * streamed gate paid 30 s at sf0.1 for it; this form is pure
    * integer min-aggregation after the single digest). Band key =
    * the r per-seed minima zero-padded and concatenated in seed
    * order. Every step is value-identical in Spark and DuckDB, so an
    * oracle can replay the EXACT candidate set — which makes an
    * LSH-gated query checkable without a quadratic oracle-side truth
    * join (VERDICT r8 next #5). Shape matches `bandBuckets`: one
    * explode + one k-accumulator integer min aggregate + per-band
    * concat; the only shuffle carries one k-long row per doc. The
    * xxhash64 `bandBuckets` stays the production default (derives
    * seeds from one 64-bit hash the same way, fully codegen'd);
    * this variant exists for oracle-replayable gates. */
  def portableBandBuckets(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "signature length must divide into bands")
    val r = k / bands
    val P = 2147483647L // 2^31 - 1 (prime): products A_s·x stay under 2^62
    val grams = docs
      .select(col(idCol).as("id"), explode(wordGrams(col(textCol), n)).as("g"))
      .select(col("id"),
        expr("cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint) % 2147483647").as("x"))
    val mins = Seq.tabulate(k) { s =>
      val a = (2654435761L * (s + 1)) % P
      val b = (40503L * (s + 7)) % P
      min(expr(s"($a * x + $b) % $P")).as(s"h$s")
    }
    val sig = grams.groupBy(col("id")).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd.toLong).as("band"),
        concat((0 until r).map(j =>
          lpad(col(s"h${bnd * r + j}").cast("string"), 10, "0")): _*).as("h"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val buckets = bandBuckets(docs, idCol, textCol, n, k, bands)
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
      .distinct()
  }

  /** Exact word-n-gram overlap for given candidate pairs, fully
    * relational: candidates × side-A postings, equi-joined against
    * side-B postings on (doc, shingle), counted per pair — every step
    * codegen'd (the array_intersect-per-pair alternative is an
    * interpreted set-build per row and was 5× slower at 300k
    * candidates). Pairs sharing zero shingles drop out, which every
    * threshold consumer filters away regardless. Jaccard =
    * n_common / n_union, both exact integers. */
  def verifyPairs(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    val posts = docs.select(col(idCol).as("gid"), explode(wordGrams(col(textCol), n)).as("g"))
    val sizes = posts.groupBy("gid").agg(count(lit(1)).as("sz"))
    val withA = pairs.join(posts.select(col("gid").as("idA"), col("g")), "idA")
    val bSide = posts.select(col("gid").as("bid"), col("g").as("gB"))
    val common = withA
      .join(bSide, withA("idB") === bSide("bid") && withA("g") === bSide("gB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("gid").as("idA"), col("sz").as("szA")), "idA")
      .join(sizes.select(col("gid").as("idB"), col("sz").as("szB")), "idB")
      .select(col("idA"), col("idB"), col("n_common"),
        (col("szA") + col("szB") - col("n_common")).as("n_union"))
  }

  /** Exact n-gram Jaccard over ALL overlapping pairs, via an inverted
    * index: explode shingles → self-equi-join on the shingle →
    * count(*) per pair = |A ∩ B|; |A ∪ B| = |A| + |B| − |A ∩ B|.
    *
    * Pairs sharing zero shingles never materialize, so the cost is
    * Σ_gram (docs-per-gram choose 2) — data-dependent, but vastly
    * below docs² for real corpora, and every step is a codegen'd
    * shuffle join + hash aggregate (vs. the naive cross-join with an
    * interpreted array_intersect per pair, which is O(docs² × |grams|)
    * and already takes minutes at 5k docs). Skewed (ubiquitous)
    * shingles are the known hazard at scale — AQE skew-join splits
    * them; a df-style stop-shingle filter is the standard next lever. */
  def allPairsNgram(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    val grams = docs.select(col(idCol).as("gid"), wordGrams(col(textCol), n).as("grams"))
    val sizes = grams.select(col("gid"), size(col("grams")).cast("long").as("sz"))
    val posts = grams.select(col("gid"), explode(col("grams")).as("g"))
    val common = posts.alias("a")
      .join(posts.alias("b"), col("a.g") === col("b.g") && col("a.gid") < col("b.gid"))
      .groupBy(col("a.gid").as("idA"), col("b.gid").as("idB"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("gid").as("idA"), col("sz").as("szA")), "idA")
      .join(sizes.select(col("gid").as("idB"), col("sz").as("szB")), "idB")
      .select(col("idA"), col("idB"), col("n_common"),
        (col("szA") + col("szB") - col("n_common")).as("n_union"))
  }

  /** Prefix-filtered exact near-dup pairs (PPJoin-style) for Jaccard
    * threshold tNum/tDen: each doc only posts its PREFIX shingles —
    * the first |g| − ⌈t·|g|⌉ + 1 under a global (rarity, shingle)
    * order — because two sets with J ≥ t MUST share a prefix element
    * (pigeonhole on the sorted order). Candidates come from the
    * prefix self-join (rare shingles ⇒ tiny buckets ⇒ few pairs),
    * then the standard exact verify. Identical output to the full
    * inverted-index join, at a fraction of the pair volume — this is
    * the exact-dedup plan that survives 100 TB. */
  /** @param maxDf stop-shingle cap: shingles seen in more than this
    *   many docs are excluded from candidate GENERATION (posting) —
    *   a df-heavy shingle contributes C(df,2) candidate pairs, so one
    *   boilerplate phrase can dominate the whole join. The verify step
    *   stays exact over ALL shingles, so reported (n_common, n_union)
    *   are unaffected — but candidate RECALL is heuristic with the cap
    *   on: a pair whose prefixes overlap only in above-cap shingles is
    *   missed. The important special case: a duplicate CLUSTER larger
    *   than maxDf docs pushes every shared shingle's df above the cap,
    *   losing the whole cluster — so set maxDf comfortably above the
    *   largest expected duplicate-cluster size for your corpus, or
    *   <= 0 to disable the cap and recover the exact PPJoin guarantee.
    *   This is the standard CCNet/BigQuery-dedup stop-word lever.
    *   Default 16 fits the testdata (planted clusters are pairs;
    *   DedupSpec pins 16 and 64 == uncapped there, profiled fastest
    *   at sf0.1). */
  def prefixFilteredNgram(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tNum: Int = 3, tDen: Int = 5, maxDf: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    val grams = docs.select(col(idCol).as("gid"), wordGrams(col(textCol), n).as("grams"))
    val posts = grams.select(col("gid"), size(col("grams")).as("sz"), explode(col("grams")).as("g"))
    val df = posts.groupBy("g").agg(count(lit(1)).as("gdf"))
    // stop-shingle filter BEFORE prefix ranking: the prefix window then
    // slides over the remaining (rarer) shingles, so recall among
    // rare-shingle-sharing pairs is unchanged while df-heavy buckets
    // never reach the self-join.
    val posted = posts.join(df, "g")
      .filter(if (maxDf > 0) col("gdf") <= maxDf else lit(true))
    val w = Window.partitionBy("gid").orderBy(col("gdf").asc, col("g").asc)
    // prefix length: sz - ceil(t*sz) + 1, with ceil(a*sz/b) = (a*sz + b - 1) div b
    val prefix = posted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - (col("sz") * tNum + tDen - 1).divide(tDen).cast("long") + 1)
      .select(col("gid"), col("sz"), col("g"))
    val cands = prefix.alias("a")
      .join(prefix.alias("b"), col("a.g") === col("b.g") && col("a.gid") < col("b.gid") &&
        // length filter: J ≥ t forces t·|B| ≤ |A| (and symmetrically)
        col("a.sz") * tNum <= col("b.sz") * tDen &&
        col("b.sz") * tNum <= col("a.sz") * tDen)
      .select(col("a.gid").as("idA"), col("b.gid").as("idB"))
      .distinct()
    verifyPairs(cands, docs, idCol, textCol, n)
      .filter(col("n_common") * tDen >= col("n_union") * tNum)
  }

  /** Containment (asymmetric-Jaccard) pairs: |A∩B| / min(|A|,|B|) ≥
    * tNum/tDen — the detector for DOC-INSIDE-DOC duplication (quoted
    * articles, concatenated scrapes), which symmetric Jaccard
    * structurally misses: a page embedded in one 10× longer scores
    * J ≈ 0.1 but containment 1.0.
    *
    * Asymmetry changes the blocking math. For the SMALLER doc A,
    * overlap ≥ t·|A| still pigeonholes into A's (|A| − ⌈t|A|⌉ + 1)
    * prefix under the global rarity order — but the larger doc gets
    * NO usable prefix bound (its partner may be arbitrarily small),
    * so the join probes small-side prefixes against the big side's
    * FULL (df-capped) postings. Cost: posting-join volume on the
    * build side, prefix-reduced probe volume — still Σ bucket²,
    * never n². Same maxDf recall caveat as prefixFilteredNgram. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tNum: Int = 4, tDen: Int = 5, maxDf: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    val grams = docs.select(col(idCol).as("gid"), wordGrams(col(textCol), n).as("grams"))
    val sizes = grams.select(col("gid"), size(col("grams")).cast("long").as("sz"))
    val posts = grams.select(col("gid"), size(col("grams")).as("sz"), explode(col("grams")).as("g"))
    val df = posts.groupBy("g").agg(count(lit(1)).as("gdf"))
    val posted = posts.join(df, "g")
      .filter(if (maxDf > 0) col("gdf") <= maxDf else lit(true))
    val w = Window.partitionBy("gid").orderBy(col("gdf").asc, col("g").asc)
    val prefix = posted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - (col("sz") * tNum + tDen - 1).divide(tDen).cast("long") + 1)
      .select(col("gid"), col("sz"), col("g"))
    // orient: the prefix side is the min side (ties broken by id so
    // each unordered pair is generated exactly once)
    val cands = prefix.alias("a")
      .join(posted.alias("b"), col("a.g") === col("b.g") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.gid") < col("b.gid"))))
      .select(least(col("a.gid"), col("b.gid")).as("idA"),
        greatest(col("a.gid"), col("b.gid")).as("idB"))
      .distinct()
    verifyPairs(cands, docs, idCol, textCol, n)
      .join(sizes.select(col("gid").as("idA"), col("sz").as("szA2")), "idA")
      .join(sizes.select(col("gid").as("idB"), col("sz").as("szB2")), "idB")
      .select(col("idA"), col("idB"), col("n_common"),
        least(col("szA2"), col("szB2")).as("n_min"))
      .filter(col("n_common") * tDen >= col("n_min") * tNum)
  }

  /** Jaro-Winkler linkage at scale: prefix-filtered CHARACTER-multiset
    * overlap join as candidate generator, the native `jaro_winkler`
    * scorer as verifier — the high-entropy-key plan the blocked
    * x1_jaro_linkage query documents (fixed blocking keys are the
    * right move at ~650 blocks; at 100 TB with high-entropy keys the
    * block histogram flattens and THIS is the scale path; VERDICT r6
    * #7 wired it).
    *
    * Candidate bound (provable, so recall is EXACT with maxDf off):
    * with the boost capped at ℓ≤4·p=0.1, jw ≤ 0.4 + 0.6·jaro; and
    * jaro ≤ (2·m/min + 1)/3 with m ≤ the char-multiset overlap. So
    * jw > t forces overlap > ((5t−3)/2)·min — for t=0.9 a 3/4-overlap
    * multiset join — and (via jaro ≤ (2 + min/max)/3) min/max >
    * 5t−4, the length-ratio prune. Multiset semantics ride the
    * standard occurrence-indexing trick (i-th 'a' → token "a#i"), so
    * the overlap join is the `containmentPairs` min-side prefix
    * scheme verbatim: the smaller key posts its (sz − ⌈c·sz⌉ + 1)
    * rarest indexed chars, the join probes them against full postings.
    * Threshold is the rational tNum/tDen (needs 5·tNum > 3·tDen for a
    * usable bound, i.e. t > 0.6). Scorer units are CODEPOINTS — keys
    * are compared char-by-char exactly as `jaro_winkler` sees them.
    *
    * Output: (idA, idB, sim) with idA < idB and sim > tNum/tDen.
    * JaroLinkageSpec pins equality with the all-pairs scorer on a
    * high-entropy fixture. */
  def jaroLinkage(docs: DataFrame, idCol: String, keyCol: String,
      tNum: Int = 9, tDen: Int = 10, maxDf: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(5 * tNum > 3 * tDen, s"jaroLinkage needs t > 0.6, got $tNum/$tDen")
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    // overlap fraction c = (5t − 3)/2 as the exact rational cN/cD
    val (cN, cD) = (5 * tNum - 3 * tDen, 2 * tDen)
    val keyed = docs.select(col(idCol).as("gid"), col(keyCol).as("key"))
    val sized = keyed.select(col("gid"), length(col("key")).as("sz"))
    // occurrence-indexed characters: multiset intersection == set
    // intersection of (char, occurrence#) tokens
    val occ = keyed
      .select(col("gid"), posexplode(split(col("key"), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "")
      .withColumn("oi", row_number().over(Window.partitionBy("gid", "ch").orderBy("pos")))
      .select(col("gid"), concat_ws("#", col("ch"), col("oi")).as("g"))
    val posts = occ.join(sized, "gid")
    val dfreq = posts.groupBy("g").agg(count(lit(1)).as("gdf"))
    val posted = posts.join(dfreq, "g")
      .filter(if (maxDf > 0) col("gdf") <= maxDf else lit(true))
    val w = Window.partitionBy("gid").orderBy(col("gdf").asc, col("g").asc)
    val prefix = posted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - (col("sz") * cN + cD - 1).divide(cD).cast("long") + 1)
      .select(col("gid"), col("sz"), col("g"))
    // min-side prefixes probe full postings (containmentPairs
    // orientation), with the provable length-ratio prune inline when
    // the bound is informative (5t − 4 > 0)
    val lenOk =
      if (5 * tNum > 4 * tDen)
        col("a.sz") * (5 * tNum - 4 * tDen) < col("b.sz") * tDen &&
          col("b.sz") * (5 * tNum - 4 * tDen) < col("a.sz") * tDen
      else lit(true)
    val cands = prefix.alias("a")
      .join(posted.alias("b"), col("a.g") === col("b.g") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.gid") < col("b.gid"))) && lenOk)
      .select(least(col("a.gid"), col("b.gid")).as("idA"),
        greatest(col("a.gid"), col("b.gid")).as("idB"))
      .distinct()
    cands
      .join(keyed.toDF("idA", "key_a"), "idA")
      .join(keyed.toDF("idB", "key_b"), "idB")
      .withColumn("sim", call_function("jaro_winkler", col("key_a"), col("key_b")))
      .filter(col("sim") * tDen > tNum)
      .select(col("idA"), col("idB"), col("sim"))
  }

  /** Near-dup REMOVAL (the materializer a training pipeline actually
    * runs): keep every doc that is never the HIGHER id of a near-dup
    * pair — i.e. keep the LOCAL MINIMA of the pair graph. One
    * deterministic anti-join over the pair set. For clique-shaped
    * duplicate clusters (the common case: near-dups of one source are
    * pairwise near-dups) this keeps exactly the lowest-id
    * representative per cluster. On CHAINS it over-removes relative
    * to a sequential greedy sweep: in 4–5, 5–6 (4 and 6 not dups of
    * each other) both 5 AND 6 are dropped, though 6 duplicates no
    * kept doc — the price of staying single-pass; an exact maximal
    * independent set needs iterative propagation. DedupSpec pins both
    * behaviors. `pairs` must carry (idA, idB) with idA < idB — any of
    * the pair generators above qualifies. */
  def keepRepresentatives(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("idB").as(idCol)), Seq(idCol), "left_anti")

  /** Connected-component cluster labels over the near-dup pair graph —
    * TRANSITIVE dedup, the semantics large-corpus pipelines
    * standardize on (a chain A~B~C is ONE duplicate group even when
    * A,C aren't directly similar). Distributed min-label propagation:
    * every doc starts labeled with its own id; each iteration every
    * doc takes the min label among itself and its neighbors; converged
    * when no label changes (O(component diameter) iterations — near-dup
    * components are shallow cliques, so typically 1–2). Per iteration:
    * one join + partial-agg min + one join, with `localCheckpoint`
    * truncating the lineage so plans stay O(1) per round instead of
    * compounding. The convergence check is a driver-side count —
    * bounded actions, standard for iterative Spark (GraphX/GraphFrames
    * CC is this same loop). The loop runs ONLY over docs that appear
    * in some pair — in a deduped corpus that graph is a sliver of the
    * data, and singletons (the overwhelming majority at 100 TB) never
    * enter an iteration: they union back in labeled with their own
    * id, one anti-join, zero per-round cost. Returns (id, cluster)
    * for EVERY doc. */
  def clusterLabels(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
      .union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .localCheckpoint(true)
    // both directions exist, so src alone covers every pair member
    val members = edges.select(col("src").as("id")).distinct().localCheckpoint(true)
    var labels = members.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("nid")).agg(min("lbl").as("nlbl"))
      // change flag computed IN the propagation join (the old label is
      // already on the row) — the convergence check is then a filter
      // over the materialized checkpoint, not an extra join job
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nlbl2"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .select(col("id"), col("nlbl2").as("lbl"), col("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      labels = next.select("id", "lbl")
      it += 1
    }
    val singletons = docs.select(col(idCol).cast("long").as("id"))
      .join(members, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    labels.select(col("id"), col("lbl").as("cluster")).union(singletons)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the scale path for `clusterLabels`.
    * Min-label propagation converges in O(component diameter) rounds;
    * a pathological chain of D near-dup docs (scrape → mirror →
    * mirror-of-mirror …) costs D shuffle rounds. Star contraction
    * converges in O(log² n) rounds REGARDLESS of diameter — each
    * round both flattens trees (large-star hangs every
    * larger-than-parent node directly under the neighborhood min) and
    * contracts chains (small-star re-points a node's smaller
    * neighbors at the neighborhood min), so path length roughly
    * halves per round.
    *
    * Per round: two groupBy-min shuffles over the EDGE set (not the
    * corpus — singletons never enter), each followed by one narrow
    * join; edges are `localCheckpoint`ed so lineage stays O(1).
    * Convergence = edge-set fixpoint, checked with one (count,
    * xor-of-hash) aggregate per round — a signature compare, not a
    * set compare. At fixpoint the graph is a forest of depth-1 stars:
    * every node points at its component min.
    *
    * Same contract as `clusterLabels`: returns (id, cluster) for
    * EVERY doc, cluster = min doc id of the component.
    * `ConnectedComponentsSpec` pins equality with `clusterLabels` on
    * chains, cliques, stars, binary trees, and seeded random graphs. */
  /** Edge-count bound under which the component labeling runs as a
    * DRIVER-side union-find instead of distributed star contraction —
    * the size-gated-broadcast discipline (a17_triangles) applied to
    * the contraction loop: below it the whole edge set is one bounded
    * collect (≤ ~8 MB of two longs per row), labeled in O(m α(m)) on
    * the driver, and re-parallelized — replacing O(log² n) rounds of
    * two shuffles + a checkpoint + a signature job each, which at
    * small edge counts is pure fixed overhead (the t16 streamed-ER
    * gate pays that loop PER MICRO-BATCH on a few-thousand-edge
    * subgraph). Above the bound the contraction loop is unchanged —
    * at 100 TB every corpus-scale caller takes it (and the
    * co-purchase components gate stays distributed at sf0.1: 1.196 M
    * edges > the bound, deliberately). */
  val DriverMaxEdges: Long = 500000L

  def clusterLabelsStar(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 30, driverMaxEdges: Long = DriverMaxEdges): DataFrame = {
    // Directed convention throughout: (u, v) with v < u ("child →
    // smaller parent"). Initial orientation: larger endpoint first.
    var edges = pairs
      .select(greatest(col("idA").cast("long"), col("idB").cast("long")).as("u"),
        least(col("idA").cast("long"), col("idB").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint(true)

    // counting the checkpointed edge set is one cached-scan job; the
    // gate must never trigger an unbounded collect, so the count comes
    // first and the collect only fires under the bound
    if (edges.count() <= driverMaxEdges) {
      val spark = docs.sparkSession
      val es = edges.collect()
      val parent = new java.util.HashMap[Long, Long](es.length * 2)
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) x = parent.getOrDefault(x, x)
        // path compression toward the root
        var y = x0
        while (parent.getOrDefault(y, y) != y) { val n = parent.get(y); parent.put(y, x); y = n }
        x
      }
      es.foreach { r =>
        val (ru, rv) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ru != rv) {
          // min-id root so the representative IS the component min —
          // the same label the distributed fixpoint produces
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
        }
      }
      val ids = new java.util.HashSet[Long](es.length * 2)
      es.foreach { r => ids.add(r.getLong(0)); ids.add(r.getLong(1)) }
      val out = new Array[(Long, Long)](ids.size())
      val it0 = ids.iterator(); var i = 0
      while (it0.hasNext) { val id = it0.next(); out(i) = (id, find(id)); i += 1 }
      import spark.implicits._
      val inGraph = out.toSeq.toDF("id", "cluster")
      val singletons = docs.select(col(idCol).cast("long").as("id"))
        .join(inGraph.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster"))
      return inGraph.unionByName(singletons)
    }

    // One-job edge-set signature: order-independent sum of row hashes
    // (decimal(38,0) — long sums overflow under ANSI) plus the count;
    // over a distinct edge set the pair is collision-safe in practice.
    def signature(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    var sig = signature(edges)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      // LARGE-STAR over the symmetrized graph: for each node n with
      // closed neighborhood min m(n), every strictly LARGER neighbor w
      // re-points at m(n). Output edges are (w, m(n)) with
      // m(n) <= n < w — orientation is preserved by construction.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u").as("n"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(mins, sym("u") === mins("n"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // SMALL-STAR over the directed graph: each node u's out-
      // neighbors are all < u; with m = their min, re-point u and
      // every out-neighbor (except m itself) at m.
      val smins = large.groupBy("u").agg(min("v").as("m"))
      val joined = large.join(smins, "u")
      val small = joined
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)

      val nsig = signature(small)
      done = nsig == sig
      sig = nsig
      edges = small
      it += 1
    }
    // Loud failure over silent wrong answers: a non-fixpoint edge set
    // would label non-roots with an intermediate parent, not the
    // component min. O(log² n) convergence makes this unreachable in
    // practice (30 rounds covers ~2^(2^5) nodes), so the check is free.
    require(done, s"clusterLabelsStar did not converge in $maxIter rounds")

    // Fixpoint stars: non-roots are the `u` side, roots appear only as
    // `v`. Roots label themselves; singleton docs never entered.
    val members = edges.select(col("u").as("id"), col("v").as("cluster"))
    val roots = edges.select(col("v").as("id")).distinct()
      .join(edges.select(col("u").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    val inGraph = members.unionByName(roots)
    val singletons = docs.select(col(idCol).cast("long").as("id"))
      .join(inGraph.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    inGraph.unionByName(singletons)
  }

  /** 64-bit SimHash over character n-gram shingles WITH multiplicity
    * (sequence-sensitive, so word-order changes register). Returns
    * (id, simhash: long with bit 63 kept zero — 63 usable bits).
    *
    * Computed by the codegen'd single-pass `SimHashExpr` — a pure
    * scan-local projection, no explode/shuffle/aggregate in the
    * signature stage (SimHashSpec pins it equal to the relational
    * form below). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, charN: Int = 5,
      bits: Int = 63): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession) // idempotent
    docs.select(col(idCol).as("id"),
      call_function("simhash64", col(textCol), lit(charN), lit(bits)).as("simhash"))
  }

  /** Relational baseline for `simhash` (explode shingles, one
    * hash-aggregate with `bits` conditional-sum accumulators): same
    * output, kept as the expression's spec oracle and as the shape
    * you'd fall back to without extension points. */
  def simhashRelational(docs: DataFrame, idCol: String, textCol: String, charN: Int = 5,
      bits: Int = 63): DataFrame = {
    val shingles = docs.select(
      col(idCol).as("id"),
      explode(
        when(length(col(textCol)) >= charN,
          transform(sequence(lit(1), length(col(textCol)) - (charN - 1)),
            i => col(textCol).substr(i, lit(charN))))
          .otherwise(array(col(textCol)))).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val sums = Seq.tabulate(bits) { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val bitSums = shingles.groupBy(col("id")).agg(sums.head, sums.tail: _*)
    val hash = (0 until bits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col("id"), hash.as("simhash"))
  }

  /** Pairs within the given Hamming distance of each other's simhash.
    * All-pairs — the small-scale baseline only. */
  def simhashNearPairs(sims: DataFrame, maxHamming: Int): DataFrame = {
    val a = sims.select(col("id").as("idA"), col("simhash").as("sa"))
    val b = sims.select(col("id").as("idB"), col("simhash").as("sb"))
    a.join(b, col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Scale path for the same result: pigeonhole banding. Split the
    * hash into maxHamming+1 bit-blocks — two hashes within Hamming
    * distance d differ in at most d blocks, so at least one block is
    * IDENTICAL. Docs bucket by (block index, block value); the
    * equi-join on buckets yields candidates (O(n·blocks) index, join
    * touches collisions only); the exact Hamming filter then runs on
    * candidates instead of n²/2 pairs. Provably the same output as
    * simhashNearPairs. */
  def simhashNearPairsBanded(sims: DataFrame, maxHamming: Int, bits: Int = 63): DataFrame = {
    val blocks = maxHamming + 1
    val blockBits = bits / blocks // trailing bits above blocks*blockBits join the last block
    val blockCols = (0 until blocks).map { b =>
      val width = if (b == blocks - 1) bits - b * blockBits else blockBits
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), b * blockBits)
          .bitwiseAND(lit((1L << width) - 1L)).as("v"))
    }
    val buckets = sims
      .select(col("id"), col("simhash"), explode(array(blockCols: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.blk").as("blk"), col("bb.v").as("v"))
    val a = buckets.select(col("id").as("idA"), col("simhash").as("sa"), col("blk"), col("v"))
    val b = buckets.select(col("id").as("idB"), col("simhash").as("sb"), col("blk").as("blkB"), col("v").as("vB"))
    a.join(b, col("blk") === col("blkB") && col("v") === col("vB") && col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
