package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class PercentilesSpec extends SparkSpec {

  test("sort-based exact percentiles are bit-identical to the built-in on testdata") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val sorted = Percentiles.exact(li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5, 0.9, 0.99), Seq("p50", "p90", "p99"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(sorted == builtin)
  }

  test("all-null group is kept with NULL percentile, like the built-in") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("g", "x")
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 2.0)
    assert(got(1).getString(0) == "b" && got(1).isNullAt(1))
    val builtin = df.groupBy($"g").agg(expr("percentile(x, 0.5)").as("p50"))
      .orderBy("g").collect()
    assert(builtin.length == 2 && builtin(1).isNullAt(1)) // same contract
  }

  test("integral position collapses to the exact rank value; nulls excluded") {
    val s = spark; import s.implicits._
    // 5 values: p=0.5 lands exactly on rank 2 (0-based) => 30.0, no interpolation
    val df = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(50.0), None)
      .toDF("x").withColumn("g", lit(1))
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5, 0.25), Seq("p50", "p25"))
      .collect().head
    assert(got.getDouble(1) == 30.0)
    assert(got.getDouble(2) == 20.0) // pos=1.0 exactly => value at rank 1
  }

  test("two-group interpolation matches hand computation") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0), ("b", 4.0), ("b", 8.0))
      .toDF("g", "x")
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .orderBy("g").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 1.5)  // pos 0.5 between 1 and 2
    assert(got("b") == 3.0)  // pos 1.5 between 2 and 4
  }
}
