package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `a25_backtest` against a driver-side reference: replay the
  * a25_holt integer recurrence per user in plain Scala, collect the
  * one-step-ahead absolute errors at every cutoff, and compare the
  * per-user (n_eval, MAE). Also pins consistency with a25_holt: a
  * user's backtest evaluates exactly nd−1 days. */
class BacktestSpec extends SparkSpec {

  test("rolling-origin backtest == reference recurrence replay (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def t2(v: Long): Long = if (v < 0) -((-v) / 2) else v / 2
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))

    val want = daily.groupBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(_._2).map(_._3 * 1000L)
      if (xs.length < 2) None
      else {
        var (l, b, es) = (xs.head, 0L, 0L)
        xs.tail.foreach { xm =>
          es += math.abs(xm - (l + b))
          val ln = t2(xm + l + b); b = t2(ln - l + b); l = ln
        }
        Some((u, xs.length - 1L, es / (xs.length - 1L)))
      }
    }.toSeq.sortBy(_._1)

    val got = AnalyticsQueries.all("a25_backtest")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")

    val holtNd = AnalyticsQueries.all("a25_holt")(s, dir)
      .select(col("user_id"), col("nd")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (u, ne, _) =>
      assert(ne == holtNd(u) - 1L, s"user $u: n_eval $ne != nd-1 ${holtNd(u) - 1}")
    }
  }
}
