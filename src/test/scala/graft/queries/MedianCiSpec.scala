package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `a4_median_ci` against the definition: collect and sort the
  * cents values, index the lo/median/hi order statistics directly,
  * and compare — including the declared rank formulas. */
class MedianCiSpec extends SparkSpec {

  test("order-statistic median CI == sorted-index definition (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val xs = Tables.orders(s, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    val rlo = math.floor((n - 1.959964 * math.sqrt(n.toDouble)) / 2).toLong
    val rhi = math.ceil((n + 1.959964 * math.sqrt(n.toDouble)) / 2).toLong + 1
    // value at rank r = smallest value with cum >= r == xs(r-1)
    val med = xs(((n + 1) / 2 - 1).toInt) // smallest with 2*cum >= n
    val want = (n, rlo, rhi, med, xs((rlo - 1).toInt), xs((rhi - 1).toInt))

    val r = AnalyticsQueries.all("a4_median_ci")(s, dir).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(got == want, s"got $got want $want")
    assert(got._5 <= got._4 && got._4 <= got._6, "CI must bracket the median")
  }
}
