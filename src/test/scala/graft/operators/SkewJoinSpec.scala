package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SkewJoinSpec extends SparkSpec {

  test("differentiated join equals the plain inner join on real tables") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val diff = SkewJoin.differentiated(ev, cust, "user_id", "c_custkey", hotKeys = 16)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(diff == plain)
  }

  test("hot branch broadcasts, cold branch shuffles — the split is visible in the plan") {
    val s = spark; import s.implicits._
    // 90% of rows share one key: the textbook straggler maker
    val left = ((1 to 9000).map(_ => 1L) ++ (1 to 1000).map(i => (i % 97).toLong + 2L))
      .toDF("k").withColumn("v", col("k") * 2)
    val right = (1L to 100L).toDF("rk").withColumn("w", col("rk") + 10)
    val j = SkewJoin.differentiated(left, right, "k", "rk", hotKeys = 4)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hot keys must take the broadcast path:\n${plan.take(1500)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(plan.contains("Union"), "hot and cold branches must union")
    // and the answer is still exactly the plain join
    val got = j.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .collect().map(_.toSeq).toSet
    val exp = left.join(right, col("k") === col("rk"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .collect().map(_.toSeq).toSet
    assert(got == exp)
  }

  test("null keys are dropped on both paths, matching inner-join semantics") {
    val s = spark; import s.implicits._
    val left = Seq(Some(1L), Some(1L), None, Some(2L)).toDF("k")
    val right = Seq(Some(1L), None, Some(2L)).toDF("rk")
    val diff = SkewJoin.differentiated(left, right, "k", "rk", hotKeys = 1).count()
    val plain = left.join(right, col("k") === col("rk")).count()
    assert(diff == plain)
  }
}
