package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins `x5_shapley_attribution`: the efficiency identity
  * Σφ6 = 6·(v(full) − v(∅)) must hold exactly, and the per-channel
  * values must equal an independent driver-side Shapley computation
  * over the collected coalition counts (all 3! permutations averaged —
  * the definition, not the subset-weight shortcut the query uses). */
class ShapleySpec extends SparkSpec {

  test("Shapley attribution: efficiency identity + permutation-definition equality (sf0.001)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val rows = AnalyticsQueries.all("x5_shapley_attribution")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("click", "signup", "view"))
    val (vAll, vNone) = (rows.head._3, rows.head._4)
    assert(rows.map(_._2).sum == 6L * (vAll - vNone), "efficiency identity broken")

    // independent v(S): recompute coalition conversions from events
    val ev = Tables.events(s, dir)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fp"))
    val masks = ev.join(fp, Seq("user_id"), "left")
      .filter(col("event_type").isin("view", "click", "signup"))
      .filter(col("fp").isNull || col("ts") < col("fp"))
      .groupBy(col("user_id"))
      .agg((max(when(col("event_type") === "view", 1).otherwise(0))
        + max(when(col("event_type") === "click", 2).otherwise(0))
        + max(when(col("event_type") === "signup", 4).otherwise(0))).as("m"),
        max(when(col("fp").isNotNull, 1L).otherwise(0L)).as("conv"))
      .collect().map(r => (r.getAs[Number](1).intValue, r.getAs[Number](2).longValue))
    val vOf = (0 to 7).map(sS =>
      sS -> masks.filter(t => (t._1 & sS) == t._1).map(_._2).sum).toMap
    // Shapley by DEFINITION: average marginal contribution over all
    // 3! channel orderings, ×6 to stay integral
    val bits = Seq("view" -> 1, "click" -> 2, "signup" -> 4)
    val want = bits.map { case (name, b) =>
      val perms = bits.map(_._2).permutations.toSeq
      val phi6 = perms.map { p =>
        val before = p.takeWhile(_ != b).sum
        vOf(before | b) - vOf(before)
      }.sum
      name -> phi6
    }.toMap
    rows.foreach { case (ch, phi6, _, _) =>
      assert(phi6 == want(ch), s"$ch: $phi6 != ${want(ch)}")
    }
  }
}
