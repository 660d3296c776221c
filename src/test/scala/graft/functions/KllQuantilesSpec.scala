package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KllQuantilesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("rank error within 3x the k=200 bound against exact order statistics") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val li = Tables.lineitem(s, dir).select($"l_returnflag", $"l_extendedprice")
    val est = li.groupBy($"l_returnflag")
      .agg(call_function("kll_quantiles",
        $"l_extendedprice", lit(0.25), lit(0.5), lit(0.75), lit(0.95)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byFlag = li.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val eps = 0.0165 * 3 // DataSketches k=200 normalized rank error, generous
    for ((flag, sorted) <- byFlag; (q, i) <- Seq(0.25, 0.5, 0.75, 0.95).zipWithIndex) {
      val v = est(flag)(i)
      // the estimate's actual rank must be within eps of the requested rank
      val rank = sorted.count(_ <= v).toDouble / sorted.length
      assert(math.abs(rank - q) <= eps, s"$flag q=$q: est $v has rank $rank")
    }
  }

  test("plan is partial+final ObjectHashAggregate (mergeable sketch partials)") {
    val s = spark; import s.implicits._
    Functions.register(s)
    val df = Tables.lineitem(s, dir).groupBy($"l_returnflag")
      .agg(call_function("kll_quantiles", $"l_extendedprice", lit(0.5)).as("qs"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(800))
    assert(p.contains("partial_kll_quantiles"), p.take(800))
  }

  test("sketch bytes round-trip: serialize + deserialize + merge across splits") {
    val agg = KllQuantilesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), Seq(0.5))
    val (a, b) = (agg.createAggregationBuffer(), agg.createAggregationBuffer())
    (1 to 1000).foreach(i => a.update(i.toDouble))
    (1001 to 2000).foreach(i => b.update(i.toDouble))
    val merged = agg.merge(agg.deserialize(agg.serialize(a)), agg.deserialize(agg.serialize(b)))
    val med = merged.getQuantile(0.5,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
    assert(math.abs(med - 1000.0) <= 2000 * 0.05, s"median of 1..2000 ~ 1000, got $med")
    // empty buffer evals to null, not a crash
    assert(agg.eval(agg.createAggregationBuffer()) == null)
  }

  test("resolves in SQL through the extension registration") {
    val r = spark.sql(
      "SELECT kll_quantiles(CAST(x AS DOUBLE), 0.5) AS qs FROM VALUES (1), (2), (3) t(x)")
      .head.getSeq[Double](0)
    assert(r.head == 2.0)
  }
}
