package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset sampling/splitting operators for training-data pipelines
  * (north-star): content-hash splits, stratified sampling, and
  * deterministic global shuffle.
  *
  * All three are pure narrow/maps + at most one sort — no state, no
  * RNG: determinism comes from content hashes, so the same row lands
  * in the same split/shard on any cluster, any partitioning, any day.
  * That property (stability under re-runs and backfills) is what
  * train/test hygiene actually requires — `rand()`-based sampling
  * re-splits every run and leaks eval data into training.
  */
object Sampling {

  /** Content-hash train/test split on a key column: the row's first
    * md5 nibble (16 buckets) decides membership — `trainBuckets`/16 of
    * the data goes to "train". md5 is available in every engine, so
    * the split is reproducible outside Spark too. */
  def splitColumn(keyCol: Column, trainBuckets: Int = 13): Column = {
    require(trainBuckets > 0 && trainBuckets < 16)
    val nibble = conv(substring(md5(keyCol.cast("binary")), 1, 1), 16, 10).cast("int")
    when(nibble < trainBuckets, lit("train")).otherwise(lit("test"))
  }

  /** Per-stratum sampling with exact deterministic membership: keep a
    * row iff its md5 bucket (out of `denom`) is below the stratum's
    * numerator. Same stability story as splitColumn. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], denom: Int = 1000): DataFrame = {
    val bucket = pmod(conv(substring(md5(col(keyCol).cast("binary")), 1, 8), 16, 10).cast("long"), lit(denom))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, frac)) =>
      acc || (col(stratumCol) === stratum && bucket < (frac * denom).toLong)
    }
    df.filter(keep)
  }

  /** K-fold cross-validation assignment: fold = md5(content) mod k —
    * the k-way generalization of splitColumn, with the same stability
    * guarantee (a row's fold never changes across runs, engines, or
    * partitionings). Two hex bytes give 65536 buckets, so fold sizes
    * are balanced to ±O(1/256) for any k ≤ 16. */
  def foldColumn(keyCol: Column, k: Int): Column = {
    require(k > 1 && k <= 16, s"k must be in 2..16, got $k")
    conv(substring(md5(keyCol.cast("binary")), 1, 4), 16, 10).cast("long") % k
  }

  /** Deterministic global shuffle: total order by a keyed hash. Used
    * before sharding training data so shard contents are reproducible;
    * vary `seed` to get a different (but again reproducible) order. */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Int = 0): DataFrame =
    df.orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))
}
