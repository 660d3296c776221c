package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * local[32] here, but every knob is chosen to survive a real cluster:
  * AQE on (runtime shuffle coalescing, skew-join splitting), shuffle
  * partitions sized to the local core count (on a cluster this would be
  * 2-3x total cores), UTC everywhere for oracle parity.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions) // native fns: normalize_text, vec_dot
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = 32): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
