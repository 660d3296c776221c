package graft.queries

import java.sql.Date

import graft.SparkSpec

/** Pins the W13 gap-day CONTRACT (ADVICE r2): a report day inside
  * [min day, max day] whose trailing 7-day window holds zero active
  * users is ABSENT from the output, not wau=0 — the dense testdata
  * never exercises this, so a fixture with an activity gap does. */
class RollingWauSpec extends SparkSpec {

  test("rollingWau on a gapped fixture: sparse output, absent gap days, exact counts") {
    val s = spark; import s.implicits._
    // users active on day 1/2 and again on day 20 — days 9..19 have an
    // empty trailing window
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01")),
      (2L, Date.valueOf("2024-01-02")),
      (1L, Date.valueOf("2024-01-20"))).toDF("user_id", "day")
    val got = AnalyticsQueries.rollingWau(daily).collect()
      .map(r => r.getTimestamp(0).toLocalDateTime.toLocalDate.toString -> r.getLong(1)).toMap
    // day 1 window covers {u1}; days 2..7 cover {u1, u2}; day 8 covers
    // only day-2 activity {u2}; day 20 covers {u1}
    val expected = Map(
      "2024-01-01" -> 1L, "2024-01-02" -> 2L, "2024-01-03" -> 2L,
      "2024-01-04" -> 2L, "2024-01-05" -> 2L, "2024-01-06" -> 2L,
      "2024-01-07" -> 2L, "2024-01-08" -> 1L, "2024-01-20" -> 1L)
    assert(got == expected, s"got $got")
    // the contract, explicitly: gap days inside [d0, d1] are absent
    for (d <- 9 to 19)
      assert(!got.contains(f"2024-01-$d%02d"), s"gap day $d must be absent, not wau=0")
  }

  test("rollingWau never reports outside [min day, max day]") {
    val s = spark; import s.implicits._
    val daily = Seq((1L, Date.valueOf("2024-03-10"))).toDF("user_id", "day")
    val got = AnalyticsQueries.rollingWau(daily).collect()
      .map(_.getTimestamp(0).toLocalDateTime.toLocalDate.toString).toSeq
    // a single active day contributes to 7 report days, but 6 fall
    // past the observed range and are clipped
    assert(got == Seq("2024-03-10"))
  }
}
