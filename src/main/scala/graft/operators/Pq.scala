package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) over the embedding column —
  * the memory-scale path for similarity search: vectors compress to
  * M sub-codes (here 8 × 2 bits = 64 dims → 8 codes ≈ 64× smaller),
  * and search runs on a per-query M×K lookup table of partial
  * distances instead of touching floats.
  *
  * Exact-integer discipline throughout (the `Kmeans` contract):
  * scaled 1e-6 shifted dims, round-half-up rational centroid means,
  * argmin ties to the smallest code — every stage reproduces bit for
  * bit in any engine, which is what puts PQ on the DuckDB oracle gate.
  *
  * Scale shape:
  *  - training runs ALL M sub-quantizers in one pass per Lloyd round:
  *    the sub-vector explode keys rows by (id, m), the codebook
  *    travels as one literal M×K×d/M long array inside a codegen'd
  *    projection, and the only exchange is the (m, code, idx) partial
  *    +final aggregate (≤ partitions × M·K·d rows). Driver state is
  *    M·K·(d/M) = K·d longs.
  *  - encoding is map-side only: no join, no shuffle, vectors never
  *    leave their partition; output is (id, m, code) — the compressed
  *    representation a 100 TB corpus actually stores.
  *  - ADC search reads CODES ONLY: the query vector turns into an
  *    M×K integer lookup table (driver-computed, broadcast as a
  *    literal); per stored vector the distance is M array lookups +
  *    a sum, then one global top-k. The corpus embedding column is
  *    never scanned at query time.
  */
object Pq {

  val M = 8       // sub-quantizers
  val K = 4       // default codes per sub-quantizer (the oracle-gated
                  // x2_pq_* queries pin this — their unrolled Lloyd
                  // CTEs seed vec_id < 4); callers needing a finer
                  // codebook (e.g. the IVF-PQ shortlist stage) pass k
  val subDim = 8  // dims per subspace (M * subDim = 64)

  /** (id, m, sub) — scaled sub-vectors, one row per subspace. */
  def subVectors(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x6 = Kmeans.scaledVec(col(vecCol))
    val subs = array((0 until M).map(m =>
      struct(lit(m).as("m"), slice(col("x6"), m * subDim + 1, subDim).as("sub"))): _*)
    emb.select(col(idCol).cast("long").as("id"), x6.as("x6"))
      .select(col("id"), explode(subs).as("ms"))
      .select(col("id"), col("ms.m").as("m"), col("ms.sub").as("sub"))
  }

  /** Exact squared distance between a sub-vector column and the
    * codebook entry for (m-column, literal code c). */
  private def d2Book(sub: Column, m: Column, books: Seq[Seq[Seq[Long]]], c: Int): Column =
    aggregate(
      zip_with(sub, element_at(element_at(typedLit(books), m + 1), c + 1),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** Code assignment: (id, m, code, d2), argmin ties → smallest code. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Long]]]): DataFrame = {
    val b = books.map(_.map(_.toSeq).toSeq).toSeq
    val dists = array((0 until books(0).length).map(c => d2Book(col("sub"), col("m"), b, c)): _*)
    subVectors(emb, idCol, vecCol)
      .select(col("id"), col("m"), dists.as("dists"))
      .select(col("id"), col("m"),
        (array_position(col("dists"), array_min(col("dists"))) - 1L).as("code"),
        array_min(col("dists")).as("d2"))
  }

  /** `iters` Lloyd rounds per subspace, all subspaces per pass. Seeds:
    * the k TRUE smallest-id vectors (ids need not be contiguous or
    * 0-based — seed c is the rank-c id; with 0..k-1 ids this is the
    * identity, which is what the oracle-gated queries pin), sliced per
    * subspace. Emptied codes keep their previous centroid (the
    * `Kmeans.fit` rule). */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
      iters: Int, k: Int = K): Array[Array[Array[Long]]] = {
    // NO checkpoint/persist of the sub-vector frame: it is corpus-
    // sized, and materializing it would cost more storage than the
    // 1-2 extra deterministic scans the Lloyd rounds re-run
    val x = subVectors(emb, idCol, vecCol)
    // bounded collects: k ids (TakeOrderedAndProject), then M·k seed
    // rows — driver state stays K·d longs
    val seedIds = x.select(col("id")).distinct().orderBy(col("id")).limit(k)
      .collect().map(_.getLong(0))
    require(seedIds.length == k, s"corpus has < $k distinct vector ids")
    val idToCode = seedIds.zipWithIndex.toMap
    val seeds = x.filter(col("id").isin(seedIds.map(Long.box): _*)).collect()
    var books = Array.ofDim[Long](M, k, subDim)
    seeds.foreach { r =>
      val sub = r.getSeq[Long](2)
      var i = 0
      while (i < subDim) { books(r.getInt(1))(idToCode(r.getLong(0)))(i) = sub(i); i += 1 }
    }
    require(seeds.length == M * k, s"expected ${M * k} seed sub-vectors, got ${seeds.length}")
    for (_ <- 1 to iters) {
      val b = books.map(_.map(_.toSeq).toSeq).toSeq
      val dists = array((0 until k).map(c => d2Book(col("sub"), col("m"), b, c)): _*)
      // two-step select: "dists" referenced twice → child projection
      // evaluates the K-distance array once per row (Kmeans idiom)
      val withCode = x.select(col("m"), col("sub"), dists.as("dists"))
        .select(col("m"), col("sub"),
          (array_position(col("dists"), array_min(col("dists"))) - 1L).as("code"))
      val sums = withCode
        .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("idx", "v")))
        .groupBy("m", "code", "idx")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.foreach { r =>
        val s = r.getLong(3); val n = r.getLong(4)
        next(r.getInt(0))(r.getLong(1).toInt)(r.getInt(2)) = (2L * s + n) / (2L * n)
      }
      books = next
    }
    books
  }

  /** Per-query ADC lookup table: lut(m)(c) = exact d2 between the
    * query's m-th scaled sub-vector and codebook entry (m, c). */
  def adcTable(query: Array[Long], books: Array[Array[Array[Long]]]): Array[Array[Long]] =
    Array.tabulate(M, books(0).length) { (m, c) =>
      var acc = 0L; var i = 0
      while (i < subDim) {
        val d = query(m * subDim + i) - books(m)(c)(i); acc += d * d; i += 1
      }
      acc
    }

  /** Asymmetric-distance search over ENCODED vectors: per (id, m) one
    * literal-table lookup, one sum per id, one global top-k — the
    * stored embeddings are never read. `codes` is `encode` output. */
  def adcTopK(codes: DataFrame, lut: Array[Array[Long]], k: Int): DataFrame = {
    val l = lut.map(_.toSeq).toSeq
    codes
      .select(col("id"),
        element_at(element_at(typedLit(l), col("m") + 1), col("code").cast("int") + 1).as("d2"))
      .groupBy("id").agg(sum("d2").as("adc_d2"))
      .orderBy(col("adc_d2"), col("id"))
      .limit(k)
  }

  /** BATCH ADC: top-k for EVERY query of a batch in ONE pass over the
    * code table (the Ivf.probeTopKBatch shape — per-query adcTopK
    * would re-plan and re-scan the codes |batch| times). `luts` pairs
    * each query id with its adcTable; all tables travel as one
    * 3-level literal (|batch|·M·K longs — model-sized), indexed per
    * row by the broadcast (q, qidx) frame. rank ≤ k lowers to
    * WindowGroupLimit, so each exchange carries ≤ k rows per query;
    * each query's own codes are excluded from its ranking. */
  def adcTopKBatch(codes: DataFrame, luts: Seq[(Long, Array[Array[Long]])], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = codes.sparkSession
    import spark.implicits._
    val l3: Seq[Seq[Seq[Long]]] = luts.map(_._2.map(_.toSeq).toSeq)
    val qdf = luts.map(_._1).zipWithIndex.toDF("q", "qidx")
    val w = Window.partitionBy(col("q")).orderBy(col("adc_d2"), col("id"))
    codes.crossJoin(broadcast(qdf))
      .filter(col("id") =!= col("q"))
      .select(col("q"), col("id"),
        element_at(element_at(element_at(typedLit(l3), col("qidx") + 1),
          col("m") + 1), col("code").cast("int") + 1).as("d2"))
      .groupBy("q", "id").agg(sum("d2").as("adc_d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q"), col("rk").cast("long").as("rk"), col("id"), col("adc_d2"))
  }
}
