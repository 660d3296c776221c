package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `a10_ols_multi`: the in-plan DECIMAL(38,0) Cramer solve must
  * equal an independent driver-side BigInt solve of the same normal
  * equations over the same rows — exact integers end to end,
  * including the truncating cleared-denominator division. */
class OlsMultiSpec extends SparkSpec {

  test("decimal Cramer solve == independent BigInt normal-equations solve (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(s, dir).select(
        round(col("l_quantity")).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))

    val n = BigInt(rows.length)
    val sx1 = rows.map(_._1).sum;  val sx2 = rows.map(_._2).sum
    val sy  = rows.map(_._3).sum
    val s11 = rows.map(t => t._1 * t._1).sum
    val s12 = rows.map(t => t._1 * t._2).sum
    val s22 = rows.map(t => t._2 * t._2).sum
    val s1y = rows.map(t => t._1 * t._3).sum
    val s2y = rows.map(t => t._2 * t._3).sum

    val det  = n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)
    val det0 = sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y)
    val det1 = n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2)
    val det2 = n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2)
    assert(det != BigInt(0), "normal matrix unexpectedly singular on testdata")
    // BigInt / truncates toward zero — the semantics the query's
    // decimal `div` and the oracle's HUGEINT `//` must both share
    val expect = Seq(det0, det1, det2).map(dj => ((dj * 1000000) / det).toLong)

    val got = AnalyticsQueries.all("a10_ols_multi")(s, dir).head()
    assert(got.getLong(0) == n.toLong)
    assert(Seq(got.getLong(1), got.getLong(2), got.getLong(3)) == expect,
      s"betas ${Seq(got.getLong(1), got.getLong(2), got.getLong(3))} != $expect")
    // sanity: a non-degenerate fit actually uses the features (this
    // SYNTHETIC corpus draws price independent of quantity, so only
    // non-zero-ness is pinned, not a direction)
    assert(got.getLong(2) != 0L && got.getLong(3) != 0L)
  }
}
