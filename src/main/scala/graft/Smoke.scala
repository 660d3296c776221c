package graft

/** Local replica of the driver's smoke gate: SparkEntry.entry on
  * sf0.001 must return rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
