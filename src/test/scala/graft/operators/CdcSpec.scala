package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Cdc.apply's changelog rules and the sequential == one-shot
  * identity the streamed sink (t5_stream_cdc) rests on. */
class CdcSpec extends SparkSpec {

  private def target = {
    val s = spark; import s.implicits._
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0)).toDF("k", "status", "price")
  }

  private def chg(rows: Seq[(Long, Long, String, String, java.lang.Double)]) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "seq", "op", "c_status", "c_price")
  }

  private val set = Map("status" -> col("c_status"), "price" -> col("c_price"))

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("U replaces, U inserts absent keys, D deletes, D on absent key is a no-op") {
    val out = Cdc.apply(target, chg(Seq(
      (1L, 1L, "U", "X", 11.0),             // replace
      (4L, 1L, "U", "N", 40.0),             // insert
      (2L, 1L, "D", null, null),            // delete
      (9L, 1L, "D", null, null))),          // absent: no-op
      "k", "seq", "op", set)
    assert(state(out) == Map(1L -> ("X", 11.0), 3L -> ("C", 30.0), 4L -> ("N", 40.0)))
  }

  test("within a slice the LATEST seq wins per key") {
    val out = Cdc.apply(target, chg(Seq(
      (1L, 1L, "U", "X", 11.0), (1L, 2L, "D", null, null),  // ends deleted
      (2L, 1L, "D", null, null), (2L, 2L, "U", "Y", 22.0))), // ends updated
      "k", "seq", "op", set)
    assert(state(out) == Map(2L -> ("Y", 22.0), 3L -> ("C", 30.0)))
  }

  test("a target column absent from `set` survives a U verbatim") {
    val out = Cdc.apply(target, chg(Seq((1L, 1L, "U", "X", 99.0))),
      "k", "seq", "op", Map("status" -> col("c_status"))) // price NOT settable
    assert(state(out) == Map(1L -> ("X", 10.0), 2L -> ("B", 20.0), 3L -> ("C", 30.0)))
  }

  test("sequential slice application equals the one-shot apply (per-key seq-ordered delivery)") {
    val s1 = chg(Seq((1L, 1L, "U", "X", 11.0), (4L, 1L, "U", "N", 40.0)))
    val s2 = chg(Seq((1L, 2L, "D", null, null), (4L, 2L, "U", "N2", 44.0)))
    val s3 = chg(Seq((2L, 3L, "U", "Z", 25.0), (4L, 3L, "D", null, null)))
    val sequential = Seq(s1, s2, s3).foldLeft(target)(
      (t, c) => Cdc.apply(t, c, "k", "seq", "op", set))
    val oneShot = Cdc.apply(target, s1.unionAll(s2).unionAll(s3), "k", "seq", "op", set)
    assert(state(sequential) == state(oneShot))
    assert(state(oneShot) == Map(2L -> ("Z", 25.0), 3L -> ("C", 30.0)))
  }
}
