package graft.operators

import graft.SparkSpec

class ChangefeedSpec extends SparkSpec {

  test("changesBetween classifies I/U/D and drops unchanged keys") {
    val s = spark; import s.implicits._
    val store = new TableStore(
      s"/root/repo/target/tmp/cdfspec-${java.util.UUID.randomUUID().toString.take(8)}",
      retain = 2)
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (5L, "e", 50.0), (6L, "f", 60.0)).toDF("id", "s", "v")
    // id 1 updated, 2/3 untouched, 5/6 deleted, 7 inserted
    val v2 = Seq((1L, "a2", 11.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (7L, "g", 70.0)).toDF("id", "s", "v")
    store.replace(spark, "t", v1)
    store.replace(spark, "t", v2)
    val feed = store.changesBetween(spark, "t", Seq("id"), stepsBack = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._2)
    assert(feed.toSeq == Seq(
      ("U", 1L, "a2", 11.0),   // post-image
      ("D", 5L, "e", 50.0),    // pre-image
      ("D", 6L, "f", 60.0),
      ("I", 7L, "g", 70.0)))
  }

  test("null-valued columns compare null-safely: null→value and value→null are updates") {
    val s = spark; import s.implicits._
    val store = new TableStore(
      s"/root/repo/target/tmp/cdfspec-${java.util.UUID.randomUUID().toString.take(8)}",
      retain = 1)
    val v1 = Seq((1L, Some("x")), (2L, None: Option[String]), (3L, None: Option[String]))
      .toDF("id", "s")
    val v2 = Seq((1L, None: Option[String]), (2L, Some("y")), (3L, None: Option[String]))
      .toDF("id", "s")
    store.replace(spark, "t", v1)
    store.replace(spark, "t", v2)
    val feed = store.changesBetween(spark, "t", Seq("id"), 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    // id 3 (null == null) must NOT appear
    assert(feed.toSeq == Seq(("U", 1L), ("U", 2L)))
  }

  test("a schema change between the versions is refused, not silently mis-diffed") {
    val s = spark; import s.implicits._
    val store = new TableStore(
      s"/root/repo/target/tmp/cdfspec-${java.util.UUID.randomUUID().toString.take(8)}",
      retain = 1)
    store.replace(spark, "t", Seq((1L, "a")).toDF("id", "s"))
    store.replace(spark, "t", Seq((1L, "a", 1.0)).toDF("id", "s", "extra"))
    intercept[IllegalArgumentException] {
      store.changesBetween(spark, "t", Seq("id"), 1)
    }
  }
}
