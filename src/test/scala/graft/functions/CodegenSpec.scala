package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins that the session-injected custom expressions actually run
  * INSIDE whole-stage codegen (the `*(n)` span), not via interpreted
  * fallback — janino failures degrade silently, so this is asserted,
  * not assumed. Inputs come from a parquet scan: literal inputs would
  * be constant-folded into a LocalTableScan (which proves foldability
  * but not codegen). */
class CodegenSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def assertStarred(df: org.apache.spark.sql.DataFrame, marker: String): Unit = {
    df.collect() // force execution so codegen actually compiled
    val plan = df.queryExecution.executedPlan.toString
    val ok = plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project") && l.contains(marker))
    assert(ok, s"$marker not inside a WholeStageCodegen Project:\n${plan.take(1200)}")
  }

  test("jaro_winkler stays inside whole-stage codegen") {
    Functions.register(spark)
    assertStarred(
      Tables.part(spark, dir)
        .select(call_function("jaro_winkler", col("p_name"), lit("martha")).as("s")),
      "jaro_winkler")
  }

  test("zorder2 stays inside whole-stage codegen") {
    Functions.register(spark)
    assertStarred(
      Tables.part(spark, dir)
        .select(call_function("zorder2",
          col("p_partkey").cast("int"), (col("p_partkey") + 1).cast("int")).as("z")),
      "zorder2")
  }

  test("kll_merge / kll_quantile stay inside whole-stage codegen over a stored sketch table") {
    Functions.register(spark)
    // the realistic path: sketches already materialized as a table,
    // scalars run in a scan-side Project (inline over an aggregate
    // they'd fold into the agg's result projection instead)
    val path = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "kllcg-").toString
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(call_function("kll_sketch", col("l_extendedprice")).as("a"),
        call_function("kll_sketch", col("l_quantity")).as("b"))
      .write.mode("overwrite").parquet(path)
    assertStarred(
      spark.read.parquet(path).select(
        call_function("kll_quantile",
          call_function("kll_merge", col("a"), col("b")), lit(0.5)).as("m")),
      "kll_quantile")
  }
}
