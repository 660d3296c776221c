package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Invariants for the product-analytics queries. The strongest pin:
  * batch lag+cumsum sessionization must reconstruct exactly the
  * sessions `session_window` (t3_session_stats) finds — two
  * independent implementations of the same semantics. */
class AnalyticsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("w7_sessionize == session_window: identical (user, start, n) and gap-shifted ends") {
    val w7 = AnalyticsQueries.all("w7_sessionize")(spark, dir)
      .select(col("user_id"), col("s_start"), col("s_end"), col("n_events"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Any]("s_start").toString,
        r.getAs[Any]("s_end").toString, r.getAs[Long]("n_events"))).toSet
    // session_window's end is last_ts + gap; shift back to compare
    val t3 = graft.streaming.Streams.sessionStats(Tables.events(spark, dir))
      .select(col("user_id"), col("s_start"),
        (col("s_end") - expr("INTERVAL 30 minutes")).as("s_end"), col("n").as("n_events"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Any]("s_start").toString,
        r.getAs[Any]("s_end").toString, r.getAs[Long]("n_events"))).toSet
    assert(w7 == t3, s"batch sessionization must agree with session_window " +
      s"(w7-only: ${(w7 -- t3).take(3)}, t3-only: ${(t3 -- w7).take(3)})")
  }

  test("a15_cuped: sufficient stats conserved, theta matches a BigInt recomputation") {
    val rows = AnalyticsQueries.all("a15_cuped")(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("variant")).toSeq == Seq(0, 1))
    // per-user frame recomputed independently (no variant split needed
    // for the pooled stats), exact integer arithmetic in BigInt
    val split = lit("2024-01-16").cast("timestamp")
    val xy = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase" && col("ts") < split,
          round(col("value") * 100).cast("long"))), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase" && col("ts") >= split,
          round(col("value") * 100).cast("long"))), lit(0L)).as("y"))
      .collect().map(r => (BigInt(r.getAs[Long]("x")), BigInt(r.getAs[Long]("y"))))
    assert(rows.map(_.getAs[Long]("n")).sum == xy.length.toLong)
    assert(rows.map(_.getAs[Long]("pre_cents")).sum == xy.map(_._1).sum.toLong)
    assert(rows.map(_.getAs[Long]("post_cents")).sum == xy.map(_._2).sum.toLong)
    val n = BigInt(xy.length)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum; val sxy = xy.map(p => p._1 * p._2).sum
    val tn = n * sxy - sx * sy; val td = n * sxx - sx * sx
    assert(td > 0, "pre-period spend must vary for theta to be defined")
    val theta = tn.toDouble / td.toDouble
    rows.foreach { r =>
      val got = r.getAs[Double]("theta")
      assert(math.abs(got - theta) <= 4 * math.ulp(theta),
        s"theta $got must match the exact-integer recomputation $theta")
      // the adjusted mean is exactly the CUPED shift of the raw mean
      val meanX = r.getAs[Long]("pre_cents").toDouble / r.getAs[Long]("n").toDouble
      val want = r.getAs[Double]("mean_post") - got * (meanX - sx.toDouble / n.toDouble)
      val cuped = r.getAs[Double]("mean_post_cuped")
      assert(math.abs(cuped - want) <= 4 * math.ulp(want))
    }
  }

  test("x5_funnel: stage timestamps strictly ordered, reached consistent with nulls") {
    val rows = AnalyticsQueries.all("x5_funnel")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = Option(r.getAs[Any]("ts_view")).map(_.toString)
      val c = Option(r.getAs[Any]("ts_click")).map(_.toString)
      val p = Option(r.getAs[Any]("ts_purchase")).map(_.toString)
      // a later stage implies every earlier stage, strictly increasing
      if (p.isDefined) assert(c.isDefined && p.get > c.get)
      if (c.isDefined) assert(v.isDefined && c.get > v.get)
      val expected = if (p.isDefined) "purchase" else if (c.isDefined) "click"
        else if (v.isDefined) "view" else "none"
      assert(r.getAs[String]("reached") == expected)
    }
  }

  test("a8_retention: offset-0 equals cohort size and dominates later offsets") {
    val rows = AnalyticsQueries.all("a8_retention")(spark, dir).collect()
      .map(r => (r.getAs[Any]("cohort_day").toString,
        r.getAs[Long]("offset_days"), r.getAs[Long]("n_users")))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (day, rs) =>
      val at0 = rs.find(_._2 == 0L).map(_._3)
      assert(at0.isDefined, s"cohort $day must have an offset-0 row")
      rs.foreach { case (_, off, n) =>
        assert(off >= 0L, "activity can never precede the first-seen day")
        assert(n <= at0.get, s"cohort $day: retained users can't exceed cohort size")
      }
    }
    val totalUsers = Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == totalUsers,
      "cohorts must partition the user base")
  }

  test("x5_markov_attribution: removal bounded by base, shares partition the credit") {
    val rows = AnalyticsQueries.all("x5_markov_attribution")(spark, dir).collect()
    assert(rows.length >= 2, "every touch channel present in the corpus gets a row")
    val pb = rows.map(_.getAs[Long]("p_base_ppm")).distinct
    assert(pb.length == 1 && pb.head > 0 && pb.head <= 1000000L)
    rows.foreach { r =>
      val pr = r.getAs[Long]("p_removed_ppm")
      val rem = r.getAs[Long]("removal_ppm")
      // the Jacobi iterate is monotone in its pv inputs, so cutting a
      // channel can only LOWER absorption — removal effects stay in
      // [0, 1e6] and recompute exactly from (p_base, p_removed)
      assert(pr >= 0L && pr <= pb.head)
      assert(rem == 1000000L - pr * 1000000L / pb.head)
      assert(r.getAs[Long]("attributed_cents") >= 0L)
    }
    // truncated shares partition the credit: each div rounds down, so
    // the sum sits within #channels of exactly 1e6
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length,
      s"share sum $shareSum")
  }

  test("a37_theilsen: slope and intercept are the brute-force lower medians") {
    val r = AnalyticsQueries.all("a37_theilsen")(spark, dir).collect()
    assert(r.length == 1)
    val nd = r(0).getAs[Long]("n_days")
    assert(r(0).getAs[Long]("n_pairs") == nd * (nd - 1) / 2)
    // brute-force replay on the ~1 100-day series (O(n²) driver-side
    // is fine at spec scale; the operator itself never does this)
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    assert(nd == daily.length)
    val slopes = (for {
      i <- daily.indices; k <- (i + 1) until daily.length
      dy = daily(k)._2 - daily(i)._2; dx = daily(k)._1 - daily(i)._1
    } yield if (dy >= 0) dy * 1000000L / dx else -((-dy) * 1000000L / dx)).sorted
    val slope = slopes((slopes.length - 1) / 2)
    assert(r(0).getAs[Long]("slope_ppm") == slope)
    val resid = daily.map { case (d, c) => c * 1000000L - slope * d }.sorted
    assert(r(0).getAs[Long]("intercept_ppm") == resid((resid.length - 1) / 2))
  }
}
