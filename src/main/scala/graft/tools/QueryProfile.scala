package graft.tools

import org.apache.spark.sql.SparkSession

/** Spot-time individual SparkEntry queries without a full bench:
  * `runMain graft.tools.QueryProfile <sfDir> <name> [name...]` —
  * 3 rounds each (noop sink, same as Bench), prints per-round secs. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; r <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF $n round $r: construct ${(t1 - t0) / 1e9}%.2f s, exec ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
