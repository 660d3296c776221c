package graft.operators

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSpec

/** Latch holders for the interleaved-writer tests. Referenced from
  * task closures as a static module access (nothing is captured), so
  * the executor threads of local mode see the same JVM objects. */
object TableStoreCasDefaultSpec {
  @volatile var entered: CountDownLatch = _
  @volatile var release: CountDownLatch = _

  /** Blocks the first task that evaluates it until `release` drops —
    * this pins the verb mid-write, AFTER its fail-fast identity check
    * and BEFORE its commit point, so the racing commit below lands
    * deterministically inside the CAS window. */
  def gate[T](it: Iterator[T]): Iterator[T] = {
    entered.countDown()
    require(release.await(120, TimeUnit.SECONDS), "gate never released")
    it
  }
}

/** VERDICT r12 missing #1 made default-on: the keyed mutation verbs
  * (upsert, deleteWhere/updateWhere, compaction, z-order, MOR folds)
  * capture the table's commit identity at their own read and refuse
  * the commit loudly if a concurrent writer landed in between —
  * ingest vs background compaction on the same table is a retryable
  * ConcurrentModificationException, never a silent last-writer-wins
  * lost update. */
class TableStoreCasDefaultSpec extends SparkSpec {
  import TableStoreCasDefaultSpec._

  private def freshStore(): TableStore = {
    // retain=1: the loser's in-flight scan may still hold the
    // displaced version's paths; production object stores never
    // reclaim a version the moment it is displaced either
    val dir = Files.createTempDirectory(Paths.get("target"), "casstore-")
    new TableStore(dir.toString, retain = 1)
  }

  private def runRacing(body: => Unit): java.util.concurrent.atomic.AtomicReference[Throwable] = {
    entered = new CountDownLatch(1)
    release = new CountDownLatch(1)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => try body catch { case e: Throwable => err.set(e) })
    t.setDaemon(true)
    t.start()
    assert(entered.await(120, TimeUnit.SECONDS), "ingest never reached its write")
    err
  }

  test("whole-table: upsert racing compact — exactly one commit refused, table intact") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.upsert(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // ingest thread: its updates block mid-write (identity captured,
    // commit not yet attempted)
    val blocking = Seq((2L, "b2")).toDF("k", "v").as[(Long, String)]
      .mapPartitions(gate(_)).toDF("k", "v")
    val err = runRacing(store.upsert(spark, "t", blocking, Seq("k")))
    // maintenance wins the race: commits while the ingest is staged
    store.compact(spark, "t")
    release.countDown()
    eventually(err.get() != null, "upsert did not fail")
    assert(err.get().isInstanceOf[java.util.ConcurrentModificationException], err.get())
    // the table is the compacted pre-ingest state — nothing half-applied
    val rows = store.read(spark, "t").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b")))
    // and the loser retries cleanly from the new version
    store.upsert(spark, "t", Seq((2L, "b2")).toDF("k", "v"), Seq("k"))
    val after = store.read(spark, "t").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(after == Seq((1L, "a"), (2L, "b2")))
  }

  test("partitioned: upsertPartitioned racing compactPartitions — loser refused, table intact") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val seed = Seq((1L, "a", 5), (2L, "b", 5), (3L, "c", 6)).toDF("k", "v", "p")
    store.upsertPartitioned(spark, "t", seed, Seq("k"), "p")
    val blocking = Seq((2L, "b2", 5)).toDF("k", "v", "p").as[(Long, String, Int)]
      .mapPartitions(gate(_)).toDF("k", "v", "p")
    val err = runRacing(store.upsertPartitioned(spark, "t", blocking, Seq("k"), "p"))
    val beforeCompact = store.commitIdentity(spark, "t")
    // maxFiles=0: treat every partition as fragmented so the racing
    // compaction is guaranteed to commit (one-file partitions would
    // otherwise no-op and dodge the race)
    store.compactPartitions(spark, "t", "p", maxFiles = 0)
    assert(store.commitIdentity(spark, "t") != beforeCompact,
      "precondition: compaction must have committed")
    release.countDown()
    eventually(err.get() != null, "upsertPartitioned did not fail")
    assert(err.get().isInstanceOf[java.util.ConcurrentModificationException], err.get())
    val rows = store.read(spark, "t").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // retry from the new state succeeds and merges
    store.upsertPartitioned(spark, "t", Seq((2L, "b2", 5)).toDF("k", "v", "p"), Seq("k"), "p")
    val after = store.read(spark, "t").select("k", "v", "nupdates").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(after == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L)))
  }

  test("the reverse race: compaction blocked mid-write loses to a committed ingest") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.upsert(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // pin ALL tasks of the next table scan — compact's rewrite reads
    // the table, so its write stalls inside the gate with its base
    // identity already captured
    entered = new CountDownLatch(1)
    release = new CountDownLatch(1)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => try {
      val base = store.currentVersionId(spark, "t")
      val slow = store.read(spark, "t").as[(Long, String, Long)]
        .mapPartitions(gate(_)).toDF("k", "v", "nupdates")
      store.replaceIfUnchanged(spark, "t", slow.coalesce(1), base)
    } catch { case e: Throwable => err.set(e) })
    t.setDaemon(true); t.start()
    assert(entered.await(120, TimeUnit.SECONDS))
    store.upsert(spark, "t", Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    release.countDown()
    eventually(err.get() != null, "compaction did not fail")
    assert(err.get().isInstanceOf[java.util.ConcurrentModificationException], err.get())
    // ingest survived; the stale compaction changed nothing
    val rows = store.read(spark, "t").select("k").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L))
  }

  test("CAS default-on has no false positives: every guarded verb still runs sequentially") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val store = freshStore()
    // whole-table chain: upsert → update → delete → compact → zorder → MOR → fold
    store.upsert(spark, "t", Seq((1L, "a", 1, 1), (2L, "b", 2, 2), (3L, "c", 3, 3))
      .toDF("k", "v", "x", "y"), Seq("k"))
    store.updateWhere(spark, "t", col("k") === 1L, Map("v" -> lit("a2")))
    store.deleteWhere(spark, "t", col("k") === 3L)
    store.compact(spark, "t")
    store.optimizeZOrder(spark, "t", "x", "y", targetFiles = 1)
    store.deleteWhereMor(spark, "t", col("k") === 2L, Seq("k"))
    store.compactDeletes(spark, "t")
    val rows = store.read(spark, "t").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a2")))
    // partitioned chain
    store.upsertPartitioned(spark, "p",
      Seq((1L, "a", 5), (2L, "b", 5), (3L, "c", 6)).toDF("k", "v", "p").repartition(3),
      Seq("k"), "p")
    store.updateWherePartitioned(spark, "p", col("k") === 1L, Map("v" -> lit("a2")), "p")
    store.deleteWherePartitioned(spark, "p", col("k") === 3L, "p")
    store.compactPartitions(spark, "p", "p")
    store.deleteWhereMorPartitioned(spark, "p", col("k") === 2L, Seq("k"), "p")
    store.compactDeletesPartitioned(spark, "p", "p")
    val prows = store.read(spark, "p").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(prows == Seq((1L, "a2")))
  }

  private def eventually(cond: => Boolean, msg: String, timeoutMs: Long = 120000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond, msg)
  }
}
