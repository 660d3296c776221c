package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of queries to files:
  * `runMain graft.tools.PlanBatch <sfDir> <outDir> <name> [name...]`
  * (the plans/r13 before/after evidence). */
object PlanBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val out = args(1)
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FC",
          "org.apache.hadoop.fs.local.RawLocalFs"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    args.drop(2).foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n"), txt)
        println(s"PLANOK $n")
      } catch { case e: Throwable => println(s"PLANFAIL $n: ${e.getMessage}") }
    }
    spark.stop()
  }
}
