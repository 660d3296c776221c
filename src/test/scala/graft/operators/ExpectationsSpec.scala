package graft.operators

import graft.SparkSpec
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {

  private def df = {
    val s = spark; import s.implicits._
    Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "O", 10.0), (2L, "F", -5.0), (2L, "X", 20.0), (null, "O", null))
      .toDF("k", "status", "price")
  }

  test("report counts violations per rule in one pass; null predicate counts as violation") {
    val got = report(df,
      Seq(notNull("k"), inRange("price", 0.0, 100.0), inSet("status", Seq("O", "F"))),
      uniqueKeys = Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("not_null:k") == (4L, 1L))
    assert(got("in_range:price") == (4L, 2L), "negative AND null price both violate")
    assert(got("in_set:status") == (4L, 1L))
    assert(got("unique:k") == (4L, 1L), "key 2 appears twice: one excess row")
  }

  test("gate throws with the failing rules in the message; clean data passes through") {
    val s = spark; import s.implicits._
    val e = intercept[IllegalStateException] {
      gate(df, Seq(notNull("k")), uniqueKeys = Seq("k"))
    }
    assert(e.getMessage.contains("not_null:k=1") && e.getMessage.contains("unique:k=1"))
    val clean = Seq((1L, "O"), (2L, "F")).toDF("k", "status")
    assert(gate(clean, Seq(notNull("k")), Seq("k")).count() == 2)
  }

  test("empty table: zero violations everywhere, no crash") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "status")
    val got = report(empty, Seq(notNull("k")), Seq("k")).collect()
    assert(got.forall(_.getLong(2) == 0L))
  }
}
