package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a query's formatted physical plan: runMain graft.tools.PlanDump <sfDir> <name> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println("PLANSTART")
    println(df.queryExecution.executedPlan.toString.take(6000))
    println("PLANEND")
    spark.stop()
  }
}
