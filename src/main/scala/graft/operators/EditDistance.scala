package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via the PassJoin segment filter
  * (Li, Deng, Feng: "PassJoin: a partition-based method for
  * similarity joins" — public algorithm; SURVEY §2 X1 linkage).
  *
  * For threshold τ, every string is partitioned into τ+1 contiguous
  * segments. If ed(a, b) ≤ τ then by pigeonhole at least one of b's
  * segments survives the ≤ τ edits untouched, so it appears in `a`
  * VERBATIM — and alignment can shift its position by at most τ.
  * Candidate generation is therefore an EQUI-join:
  *
  *   substrings of a at (target-length, segment-id, shift ≤ τ)
  *     ⋈ (length, segment-id, segment-text) of b
  *
  * versus length-bucket blocking, which joins on (block, length±τ)
  * and verifies every collision with the DP. The segment join's keys
  * are short substrings; its output is near-dup candidates plus rare
  * hash-scale collisions, typically orders of magnitude below the
  * length-bucket candidate volume — and the wide payload columns
  * (the full strings) are attached AFTER the pair set is deduped,
  * so they never ride the exploded join. At 100 TB the probe-side
  * fan-out is a constant ((2τ+1)·(τ+1)·(2τ+1) keys per row at worst,
  * most out-of-bounds-pruned) on a map-only stage; the single
  * shuffle is the narrow key join.
  *
  * Losslessness: the shift window here is the full ±τ, a superset of
  * PassJoin's tighter multi-match-aware windows — strictly more
  * candidates than the published filter, never fewer, so no true
  * pair is missed. The DP verify (`levenshtein(_, _, τ)`, banded,
  * codegen'd) then makes the result EXACT; `EditDistanceSpec` pins
  * equality against the quadratic within-block baseline and the
  * oracle gate (`x1_edit_distance`) against DuckDB's levenshtein.
  *
  * Strings shorter than τ+1 can't form τ+1 non-empty segments; they
  * are routed through a tiny residual length-bucket join against ALL
  * rows within ±τ of their length (at any real corpus this side is
  * a sliver — here p_name lengths start far above τ+1).
  */
object EditDistance {

  /** Exact unordered pairs (id_a < id_b) within `blockCol` whose
    * `strCol` values are within edit distance `tau`, with the
    * distance attached. Output columns: block, id_a, id_b, dist. */
  def pairsWithin(df: DataFrame, idCol: String, strCol: String,
      blockCol: String, tau: Int = 2): DataFrame = {
    require(tau >= 1, "tau >= 1")
    val k = tau + 1 // number of segments
    val base = df.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      col(strCol).as("s"), length(col(strCol)).as("len"))

    // segment layout for a string of length m: k segments, the first
    // (m mod k) get an extra char. All arithmetic in the plan, no UDF:
    //   li = m div k + (i < m mod k)          (segment length)
    //   si = i·(m div k) + min(i, m mod k)    (0-based start)
    def segLen(m: Column, i: Column): Column =
      (m.cast("int") / k).cast("int") + when(i < m.cast("int") % k, 1).otherwise(0)
    def segStart(m: Column, i: Column): Column =
      i * (m.cast("int") / k).cast("int") + least(i, m.cast("int") % k)

    val longSide = base.filter(col("len") >= k)

    // build side: each row's own k segments (m = len, shift = 0)
    val segs = longSide
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
      .select(col("blk"), col("id").as("id_b"), col("len").as("m"), col("i"),
        col("s").substr(segStart(col("len"), col("i")) + 1, segLen(col("len"), col("i"))).as("piece"))

    // probe side: substrings of each row at every (target length m in
    // len±τ, segment i, shift |d| ≤ τ) that fits inside the string
    val probes = longSide
      .withColumn("m", explode(sequence(col("len") - tau, col("len") + tau)))
      .filter(col("m") >= k)
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("d", explode(sequence(lit(-tau), lit(tau))))
      .withColumn("p0", segStart(col("m"), col("i")) + col("d"))
      .withColumn("li", segLen(col("m"), col("i")))
      .filter(col("p0") >= 0 && col("p0") + col("li") <= col("len"))
      .select(col("blk"), col("id").as("id_a"), col("m"), col("i"),
        col("s").substr(col("p0") + 1, col("li")).as("piece"))

    // narrow candidate pair set: both orientations are generated, keep
    // one; dedup BEFORE the wide strings attach
    val candLong = probes.join(segs, Seq("blk", "m", "i", "piece"))
      .filter(col("id_a") < col("id_b"))
      .select("blk", "id_a", "id_b").distinct()

    // residual: strings too short to partition — length-bucket join of
    // the short sliver against everything within ±τ
    val shortSide = base.filter(col("len") < k)
    val candShort = shortSide
      .withColumn("lb", explode(sequence(col("len") - tau, col("len") + tau)))
      .select(col("blk"), col("id").as("id_x"), col("lb"))
      .join(base.select(col("blk"), col("id").as("id_y"), col("len").as("lb")),
        Seq("blk", "lb"))
      .filter(col("id_x") =!= col("id_y"))
      .select(col("blk"),
        least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()

    val cands = candLong.unionByName(candShort).distinct()

    // verify: attach the strings to the DEDUPED pairs, banded DP
    val names = base.select(col("id"), col("s"))
    cands
      .join(names.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(names.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), tau))
      .filter(col("dist") >= 0)
      .select(col("blk").as(blockCol), col("id_a"), col("id_b"), col("dist"))
  }
}
