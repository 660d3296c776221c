package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot tags: named, zero-copy, CROSS-TABLE-consistent pins.
  * The contract under test: a tag's read serves exactly the tagged
  * state FOREVER — through retention truncation, partition
  * reference-diff cleanup, vacuum, and in-place merge-on-read DV
  * mutation — until the tag is dropped, at which point the pins
  * release and purge/vacuum may collect. */
class SnapshotTagSpec extends SparkSpec {

  private def fresh(retain: Int = 0): TableStore = {
    val dir = Files.createTempDirectory(Paths.get("target"), "tagstore-")
    new TableStore(dir.toString, retain)
  }

  test("a tagged whole-table version survives retention it would have fallen off") {
    val store = fresh(retain = 0) // NO retention: only the tag can keep it
    val s = spark; import s.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.upsert(spark, "t", Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    store.tagSnapshot(spark, "rel", Seq("t"))
    store.upsert(spark, "t", Seq((1L, "a3"), (3L, "c")).toDF("k", "v"), Seq("k"))
    store.upsert(spark, "t", Seq((4L, "d")).toDF("k", "v"), Seq("k"))
    // retention (0) kept only the head; ordinal time travel is gone...
    intercept[IllegalArgumentException] {
      store.readVersionsBack(spark, "t", 1).count()
    }
    // ...but the tag still serves the exact tagged state
    def tagged() = store.readTag(spark, "rel", "t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(tagged() == Seq((1L, "a"), (2L, "b")))
    store.vacuum(spark) // vacuum treats the pin as a live reference
    assert(tagged() == Seq((1L, "a"), (2L, "b")))
    // tags are immutable; unknown tags are loud
    intercept[IllegalArgumentException] {
      store.tagSnapshot(spark, "rel", Seq("t"))
    }
    intercept[IllegalArgumentException] {
      store.readTag(spark, "nope", "t")
    }
    assert(store.listTags(spark) == Seq("rel"))
    // dropping the tag releases the pin: vacuum collects the old dir
    store.dropTag(spark, "rel")
    store.vacuum(spark)
    intercept[Exception] { store.readTag(spark, "rel", "t") }
  }

  test("tag pins the DV state of tag time: later in-place MOR deletes do not leak in") {
    val store = fresh()
    val s = spark; import s.implicits._
    store.upsert(spark, "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"))
    store.deleteWhereMor(spark, "t", col("k") === 1L, Seq("k"))
    store.tagSnapshot(spark, "mid", Seq("t")) // captures DV = {1}
    // a LATER MOR delete mutates the same version dir in place —
    // the tag must keep serving exactly {2, 3}
    store.deleteWhereMor(spark, "t", col("k") === 2L, Seq("k"))
    assert(store.read(spark, "t").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L))
    assert(store.readTag(spark, "mid", "t").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    store.vacuum(spark) // the displaced tag-captured DV file is pinned
    assert(store.readTag(spark, "mid", "t").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("partitioned: tagged partition versions survive later rewrites, drops and vacuum") {
    val store = fresh()
    val s = spark; import s.implicits._
    def b(vs: (String, String, Int)*) = vs.toDF("k", "v", "p_date")
    store.upsertPartitioned(spark, "t",
      b(("a", "1", 5), ("c", "3", 6)), Seq("k"), "p_date", numFiles = Some(1))
    store.tagSnapshot(spark, "pub", Seq("t"))
    // rewrite day 5, DROP day 6 entirely, add day 7
    store.upsertPartitioned(spark, "t", b(("a", "1b", 5)), Seq("k"), "p_date",
      numFiles = Some(1))
    store.deleteWherePartitioned(spark, "t", col("k") === "c", "p_date")
    store.upsertPartitioned(spark, "t", b(("d", "4", 7)), Seq("k"), "p_date",
      numFiles = Some(1))
    store.vacuum(spark)
    val cur = store.read(spark, "t").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(cur == Seq(("a", "1b"), ("d", "4")))
    val tagged = store.readTag(spark, "pub", "t").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(tagged == Seq(("a", "1"), ("c", "3")),
      "the tag must serve the dropped partition and the pre-rewrite version")
  }

  test("cross-table consistency: one tag, two tables, both read as of the capture") {
    val store = fresh()
    val s = spark; import s.implicits._
    store.upsert(spark, "facts", Seq((1L, 10L)).toDF("k", "amt"), Seq("k"))
    store.upsertPartitioned(spark, "dims",
      Seq(("x", "v1", 1)).toDF("k", "v", "pd"), Seq("k"), "pd", numFiles = Some(1))
    store.tagSnapshot(spark, "0300-publish", Seq("facts", "dims"))
    store.upsert(spark, "facts", Seq((1L, 99L)).toDF("k", "amt"), Seq("k"))
    store.upsertPartitioned(spark, "dims",
      Seq(("x", "v2", 1)).toDF("k", "v", "pd"), Seq("k"), "pd", numFiles = Some(1))
    assert(store.readTag(spark, "0300-publish", "facts")
      .head().getAs[Long]("amt") == 10L)
    assert(store.readTag(spark, "0300-publish", "dims")
      .head().getAs[String]("v") == "v1")
    // a table the tag does not cover is a loud miss
    intercept[IllegalArgumentException] {
      store.readTag(spark, "0300-publish", "other")
    }
  }

  test("a crashed tag publish leaves only a staged temp: invisible, vacuumed; real tags survive") {
    val store = fresh()
    val s = spark; import s.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.tagSnapshot(spark, "good", Seq("t"))
    // a writer that died between staging and the publish rename
    val f = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val crashed = new Path(s"${store.root}/_tags/.half-deadbeef")
    val out = f.create(crashed, true); out.write("W\tt\tv-bogus\t-".getBytes("UTF-8")); out.close()
    assert(store.listTags(spark) == Seq("good"), "staged temps are invisible")
    store.vacuum(spark)
    assert(!f.exists(crashed), "vacuum must collect the crashed tag publish")
    assert(store.listTags(spark) == Seq("good"))
    assert(store.readTag(spark, "good", "t").count() == 1L)
  }

  test("purgeHistory refuses while a tag pins NON-HEAD state; proceeds after drop") {
    val store = fresh(retain = 2)
    val s = spark; import s.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.tagSnapshot(spark, "hold", Seq("t"))
    // a commit after the tag: the tag now pins non-head state — the
    // purge would have to keep (possibly erased) bytes alive under it
    store.upsert(spark, "t", Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      store.purgeHistory(spark, "t")
    }
    assert(e.getMessage.contains("drop the tags first"))
    assert(store.history(spark, "t").size == 2, "refusal must change nothing")
    store.dropTag(spark, "hold")
    store.purgeHistory(spark, "t")
    assert(store.history(spark, "t").size == 1)
  }

  test("a tag pinning exactly the current DV-free head does NOT block the purge (ADVICE r11 #3)") {
    val store = fresh(retain = 2)
    val s = spark; import s.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.upsert(spark, "t", Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    store.tagSnapshot(spark, "head-pin", Seq("t")) // pins the CURRENT head, no DV
    store.purgeHistory(spark, "t") // head survives the purge ⇒ the tag stays exact
    assert(store.history(spark, "t").size == 1)
    assert(store.readTag(spark, "head-pin", "t").count() == 2L,
      "the head tag must read exactly the surviving head")
    // but the SAME head tag blocks once a DV fold is pending: the fold
    // would displace the tagged dir with its erased bytes still inside
    store.deleteWhereMor(spark, "t", $"k" === 1L, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      store.purgeHistory(spark, "t")
    }
    assert(e.getMessage.contains("drop the tags first"))
    store.dropTag(spark, "head-pin")
    store.purgeHistory(spark, "t")
    assert(store.read(spark, "t").count() == 1L)
    assert(s.read.option("recursiveFileLookup", "true")
      .parquet(store.livePath("t")).filter($"k" === 1L).count() == 0L,
      "post-purge raw scan must not hold the MOR-deleted row")
  }
}
