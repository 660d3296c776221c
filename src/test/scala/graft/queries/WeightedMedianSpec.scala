package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `a4_weighted_median` against the definition: per group, sort
  * the collected (value, weight) pairs and take the smallest value
  * whose inclusive cumulative weight reaches half the total. */
class WeightedMedianSpec extends SparkSpec {

  test("distributed weighted median == sorted-scan definition (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val want = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = rs.map(_._3).sum
      var cum = 0L
      val med = sorted.find { t => cum += t._3; 2 * cum >= tot }.get._2
      (flag, med, tot)
    }.toSeq.sortBy(_._1)

    val got = AnalyticsQueries.all("a4_weighted_median")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("weighted quantiles == sorted-scan definition; p50 == weighted median (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val ks = Seq(10, 25, 50, 75, 90)
    val want = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = rs.map(_._3).sum
      // value at weighted rank ceil(k/100 * tot): first value whose
      // inclusive cumulative weight cw satisfies 100*cw >= k*tot
      val qs = ks.map { k =>
        var cum = 0L
        sorted.find { t => cum += t._3; 100 * cum >= k * tot }.get._2
      }
      (flag, tot +: qs)
    }.toSeq.sortBy(_._1)

    val got = AnalyticsQueries.all("a4_weighted_quantiles")(s, dir)
      .collect().map(r => (r.getString(0), (1 to 6).map(r.getLong).toSeq)).toSeq
    assert(got == want, s"got $got want $want")

    // internal consistency: the p50 leg IS the weighted median
    val med = AnalyticsQueries.all("a4_weighted_median")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach { case (flag, vs) => assert(vs(3) == med(flag)) }
  }
}
