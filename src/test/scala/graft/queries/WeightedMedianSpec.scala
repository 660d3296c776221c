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
}
