package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Pins the manifest commit protocol (VERDICT r1 missing #5): the
  * table path never disappears, the manifest is the single commit
  * point, failures leave the old version fully readable, and old
  * versions/legacy files are cleaned after commit. */
class TableStoreManifestSpec extends SparkSpec {

  private def freshStore(): TableStore = {
    val dir = Files.createTempDirectory(Paths.get("target"), "mstore-")
    new TableStore(dir.toString)
  }

  private def listNames(store: TableStore, name: String): Set[String] = {
    val dir = new Path(store.livePath(name))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(dir).map(_.getPath.getName).toSet
  }

  test("replace commits via manifest: one version dir, resolvable, old version deleted") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.replace(spark, "t", Seq(1, 2, 3).toDF("x"))
    val names1 = listNames(store, "t")
    assert(names1.contains("_manifest") && names1.count(_.startsWith("v-")) == 1, names1)
    store.replace(spark, "t", Seq(4, 5).toDF("x"))
    val names2 = listNames(store, "t")
    assert(names2.count(_.startsWith("v-")) == 1, names2) // displaced version gone
    assert(store.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq == Seq(4, 5))
    // the table path itself never moved
    assert(store.exists(spark, "t"))
  }

  test("retention + time travel: last N versions stay readable, older fall away") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory(Paths.get("target"), "mstore-")
    val store = new TableStore(dir.toString, retain = 2)
    store.replace(spark, "t", Seq(1).toDF("x"))       // gen 1
    store.replace(spark, "t", Seq(1, 2).toDF("x"))    // gen 2
    store.replace(spark, "t", Seq(1, 2, 3).toDF("x")) // gen 3
    assert(store.versionDepth(spark, "t") == 3)
    assert(listNames(store, "t").count(_.startsWith("v-")) == 3)
    def rows(k: Int) = store.readVersionsBack(spark, "t", k)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rows(0) == Seq(1, 2, 3) && rows(1) == Seq(1, 2) && rows(2) == Seq(1))
    // a 4th commit pushes gen 1 off the window — physically deleted
    store.replace(spark, "t", Seq(9).toDF("x"))       // gen 4
    assert(store.versionDepth(spark, "t") == 3)
    assert(listNames(store, "t").count(_.startsWith("v-")) == 3)
    assert(rows(2) == Seq(1, 2), "gen 2 is now the oldest retained")
    intercept[IllegalArgumentException](store.readVersionsBack(spark, "t", 3))
    // vacuum keeps the whole retained chain, not just the current
    store.vacuum(spark)
    assert(store.versionDepth(spark, "t") == 3)
    assert(rows(1) == Seq(1, 2, 3))
  }

  test("batch-id replay guard: a re-delivered batch is a no-op, counter bumps exactly once") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val b0 = Seq((1L, "a")).toDF("k", "v")
    store.upsert(spark, "t", b0, Seq("k"), batchId = Some(0L))
    store.upsert(spark, "t", b0, Seq("k"), batchId = Some(0L)) // replay: must not re-apply
    def nup = store.read(spark, "t").head.getAs[Long]("nupdates")
    assert(nup == 1L, "replayed batch 0 must not bump the counter")
    store.upsert(spark, "t", b0, Seq("k"), batchId = Some(1L)) // genuinely new batch
    assert(nup == 2L)
    assert(store.readCommitMeta(spark, "t").contains("1"))
    // meta publishes atomically with data: version chain still readable
    assert(store.exists(spark, "t"))
  }

  test("maintenance rewrites carry the replay watermark forward (compact must not re-open the guard)") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val b0 = Seq((1L, "a")).toDF("k", "v")
    store.upsert(spark, "t", b0, Seq("k"), batchId = Some(7L))
    store.compact(spark, "t")
    assert(store.readCommitMeta(spark, "t").contains("7"),
      "compact erased the batch watermark")
    store.upsert(spark, "t", b0, Seq("k"), batchId = Some(7L)) // replay after maintenance
    assert(store.read(spark, "t").head.getAs[Long]("nupdates") == 1L,
      "replayed batch must stay a no-op after compact")
    store.optimizeZOrder(spark, "t", "k", "k", targetFiles = 1)
    assert(store.readCommitMeta(spark, "t").contains("7"))
  }

  test("partitioned upsert rejects schema evolution (mixed-schema partitions would corrupt)") {
    val s = spark; import s.implicits._
    val store = freshStore()
    val b0 = Seq((1L, "x", 10)).toDF("k", "v", "p")
    store.upsertPartitioned(spark, "t", b0, Seq("k"), "p")
    val widened = Seq((1L, "y", 10, "extra")).toDF("k", "v", "p", "note")
    val e = intercept[IllegalArgumentException] {
      store.upsertPartitioned(spark, "t", widened, Seq("k"), "p")
    }
    assert(e.getMessage.contains("note") && e.getMessage.contains("widenPartitioned"))
  }

  test("IncrementalAgg replay guard: additive fold never double-counts") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory(Paths.get("target"), "iagg-replay-")
    val store = new TableStore(dir.toString)
    val m = Seq(graft.operators.IncrementalAgg.Measure("n",
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))))
    val batch = Seq(("a", 1.0)).toDF("k", "v")
    graft.operators.IncrementalAgg.applyBatchM(spark, store, "agg", batch, Seq("k"), m, Some(0L))
    graft.operators.IncrementalAgg.applyBatchM(spark, store, "agg", batch, Seq("k"), m, Some(0L))
    graft.operators.IncrementalAgg.applyBatchM(spark, store, "agg", batch, Seq("k"), m, Some(1L))
    assert(store.read(spark, "agg").head.getAs[Long]("n") == 2L,
      "batch 0 replay must be a no-op; batches 0 and 1 each count once")
  }

  test("replaceIfUnchanged: stale base version aborts, staged version cleaned, winner intact") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.replace(s, "t", Seq(1).toDF("x"))
    val base = store.currentVersionId(s, "t")
    assert(base.isDefined)
    // a concurrent writer commits in between
    store.replace(s, "t", Seq(2).toDF("x"))
    intercept[java.util.ConcurrentModificationException] {
      store.replaceIfUnchanged(s, "t", Seq(3).toDF("x"), base)
    }
    // the winner's data survives and no orphan v-dir leaked
    assert(store.read(s, "t").collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(listNames(store, "t").count(_.startsWith("v-")) == 1)
    // with the CURRENT version as base, the conditional commit lands
    store.replaceIfUnchanged(s, "t", Seq(3).toDF("x"), store.currentVersionId(s, "t"))
    assert(store.read(s, "t").collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("optimizeZOrder: content-identical rewrite, files skip on BOTH key columns") {
    val s = spark
    val store = freshStore()
    val src = graft.sources.Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"),
        org.apache.spark.sql.functions.col("l_quantity"))
    store.replace(s, "t", src)
    store.optimizeZOrder(s, "t", "l_orderkey", "l_partkey", targetFiles = 8)
    val after = store.read(s, "t")
    assert(after.count() == src.count())
    // same multiset of rows
    assert(after.except(src).isEmpty && src.except(after).isEmpty)
    // per-file min stats: a bottom-eighth predicate on either key
    // touches a strict subset of files
    val ver = store.resolve(s, "t")
    val files = new java.io.File(ver).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8)
    def touched(key: String): Int = {
      val r = src.agg(org.apache.spark.sql.functions.min(key),
        org.apache.spark.sql.functions.max(key)).head
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8
      files.count(f => s.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min(key)).head.getLong(0) <= cut)
    }
    assert(touched("l_orderkey") < 8, "must skip some files on the first key")
    assert(touched("l_partkey") < 8, "must skip some files on the second key")
  }

  test("compact folds many-file tables into targetFiles, content-identical") {
    val s = spark; import s.implicits._
    val store = freshStore()
    // simulate micro-batch accretion: 8-partition write → 8 files
    store.replace(spark, "t", (1 to 100).toDF("x").repartition(8))
    def parquetFiles: Int = {
      val ver = new Path(store.resolve(spark, "t"))
      val f = ver.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(ver).count(_.getPath.getName.endsWith(".parquet"))
    }
    assert(parquetFiles > 1, "precondition: fragmented table")
    store.compact(spark, "t", targetFiles = 1)
    assert(parquetFiles == 1, "compaction must hit the file target")
    assert(store.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq == (1 to 100),
      "compaction must preserve content exactly")
  }

  test("a failed write leaves the old version live and the manifest unchanged") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.replace(spark, "t", Seq(1, 2).toDF("x"))
    val before = listNames(store, "t")
    val resolvedBefore = store.resolve(spark, "t")
    intercept[Throwable] {
      store.replace(spark, "t",
        s.range(1).select(org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.lit("boom")).as("x")))
    }
    assert(store.resolve(spark, "t") == resolvedBefore)
    assert(listNames(store, "t") == before)
    assert(store.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // no stray temp dirs at the store root
    val rootFs = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!rootFs.listStatus(new Path(store.root)).exists(_.getPath.getName.startsWith(".tmp-")))
  }

  test("legacy flat layout upgrades on first replace and old files are cleaned") {
    val s = spark; import s.implicits._
    val store = freshStore()
    // simulate the pre-manifest layout: parquet files directly in root/name
    Seq(9).toDF("x").write.parquet(store.livePath("t"))
    assert(store.read(spark, "t").collect().map(_.getInt(0)).toSeq == Seq(9))
    store.replace(spark, "t", Seq(1).toDF("x"))
    val names = listNames(store, "t")
    assert(names.contains("_manifest") && names.count(_.startsWith("v-")) == 1)
    assert(!names.exists(_.endsWith(".parquet")), names) // flat files cleaned
    assert(store.read(spark, "t").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("crash between staging and commit: table reads as absent, rebuild recovers, vacuum cleans") {
    val s = spark; import s.implicits._
    val store = freshStore()
    // simulate a writer that staged a version dir but died before the
    // manifest rename: dir holds only v-x, no _manifest
    val f = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(store.livePath("t") + "/v-halfdead"))
    assert(!store.exists(spark, "t"), "uncommitted table must read as absent")
    // a rebuild (what callers do on !exists) commits cleanly and clears the orphan
    store.replace(spark, "t", Seq(7).toDF("x"))
    assert(store.exists(spark, "t"))
    assert(store.read(spark, "t").collect().map(_.getInt(0)).toSeq == Seq(7))
    assert(!listNames(store, "t").contains("v-halfdead"))
    // and vacuum alone also repairs a half-dead dir
    f.mkdirs(new Path(store.livePath("t2") + "/v-halfdead"))
    store.vacuum(spark)
    val t2 = new Path(store.livePath("t2"))
    assert(f.listStatus(t2).isEmpty, "orphan version not collected")
  }

  test("vacuum removes crash leftovers, keeps live data") {
    val s = spark; import s.implicits._
    val store = freshStore()
    store.replace(spark, "t", Seq(1, 2).toDF("x"))
    val f = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate crash leftovers
    f.mkdirs(new Path(store.root, ".tmp-t-dead1"))
    f.mkdirs(new Path(store.root, ".old-t-dead2"))
    f.mkdirs(new Path(store.livePath("t") + "/v-orphan"))
    f.create(new Path(store.livePath("t") + "/._manifest-dead"), true).close()
    store.vacuum(spark)
    val rootNames = f.listStatus(new Path(store.root)).map(_.getPath.getName).toSet
    assert(!rootNames.exists(n => n.startsWith(".tmp-") || n.startsWith(".old-")), rootNames)
    val names = listNames(store, "t")
    assert(names.count(_.startsWith("v-")) == 1 && !names.contains("v-orphan"), names)
    assert(!names.exists(_.startsWith("._manifest-")), names)
    assert(store.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("upsert flows through the manifest commit; create commits an empty version") {
    val s = spark; import s.implicits._
    val store = freshStore()
    assert(store.create(spark, "t",
      org.apache.spark.sql.types.StructType.fromDDL("k STRING, v STRING, nupdates BIGINT")))
    assert(store.read(spark, "t").isEmpty)
    store.upsert(spark, "t", Seq(("a", "x")).toDF("k", "v"), Seq("k"))
    store.upsert(spark, "t", Seq(("a", "y")).toDF("k", "v"), Seq("k"))
    val got = store.read(spark, "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "y", 2L)))
    assert(listNames(store, "t").count(_.startsWith("v-")) == 1)
  }
}
