package graft.operators

import graft.SparkSpec

/** Pins TableDiff's null semantics (the part the oracle's planted
  * slices don't reach): null-vs-value is CHANGED, null-vs-null is
  * UNCHANGED — value comparison must be the null-safe `<=>`, not `=`
  * (which would silently mark every null-carrying key unchanged). */
class TableDiffSpec extends SparkSpec {
  test("null-safe value comparison and all four statuses") {
    val s = spark; import s.implicits._
    val oldDf = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d")), (5L, None: Option[String])).toDF("k", "v")
    val newDf = Seq(
      (1L, Some("a")),                 // unchanged
      (2L, None: Option[String]),      // value -> null = changed
      (3L, Some("c")),                 // null -> value = changed
      (5L, None: Option[String]),      // null -> null = unchanged
      (6L, Some("f"))).toDF("k", "v")  // added; 4 removed
    val got = TableDiff.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "unchanged", 6L -> "added"), got)
  }

  test("mismatched non-key columns are rejected loudly") {
    val s = spark; import s.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException](TableDiff.diff(a, b, Seq("k")))
  }
}
