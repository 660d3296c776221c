package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Pins the partition-scoped upsert contract (VERDICT r1 fix #1): the
  * merge reads only touched partitions (PartitionFilters in the scan),
  * rewrites only touched partition directories, and leaves every other
  * partition's files byte-identical on disk. */
class TableStorePartitionSpec extends SparkSpec {

  private def freshStore(): TableStore = {
    val dir = Files.createTempDirectory(Paths.get("target"), "pstore-")
    new TableStore(dir.toString)
  }

  private def batch(day: Int, rows: Seq[(String, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v").withColumn("p_date", org.apache.spark.sql.functions.lit(day))
  }

  /** (relative path, length, modification time, content checksum) of
    * every data file under the table — the byte-identity fingerprint. */
  private def fileState(store: TableStore, name: String): Map[String, (Long, Long, Int)] = {
    val root = new Path(store.livePath(name))
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = f.listFiles(root, true)
    val out = scala.collection.mutable.Map[String, (Long, Long, Int)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_")) {
        val bytes = {
          val in = f.open(st.getPath)
          try {
            val b = new Array[Byte](st.getLen.toInt); in.readFully(0, b); b
          } finally in.close()
        }
        out(st.getPath.toString.stripPrefix(root.toString)) =
          (st.getLen, st.getModificationTime, java.util.Arrays.hashCode(bytes))
      }
    }
    out.toMap
  }

  test("upsert merges within a partition: insert=1, re-upsert bumps nupdates") {
    val store = freshStore()
    store.upsertPartitioned(spark, "t", batch(20250505, Seq("a" -> "x", "b" -> "y")),
      Seq("k"), "p_date", numFiles = Some(1))
    val first = store.read(spark, "t").collect()
    assert(first.length == 2 && first.forall(_.getAs[Long]("nupdates") == 1L))
    store.upsertPartitioned(spark, "t", batch(20250505, Seq("a" -> "x2")),
      Seq("k"), "p_date", numFiles = Some(1))
    val got = store.read(spark, "t").collect()
      .map(r => r.getAs[String]("k") -> (r.getAs[String]("v"), r.getAs[Long]("nupdates"))).toMap
    assert(got("a") == ("x2", 2L)) // matched: value replaced, counter bumped
    assert(got("b") == ("y", 1L))  // untouched key in same partition kept
  }

  test("a batch rewrites ONLY its partitions; others stay byte-identical") {
    val store = freshStore()
    store.upsertPartitioned(spark, "t", batch(20250505, Seq("a" -> "x", "b" -> "y")),
      Seq("k"), "p_date", numFiles = Some(1))
    store.upsertPartitioned(spark, "t", batch(20250506, Seq("c" -> "z")),
      Seq("k"), "p_date", numFiles = Some(1))
    val before = fileState(store, "t")
    assert(before.keys.exists(_.contains("p_date=20250505")))
    assert(before.keys.exists(_.contains("p_date=20250506")))

    // touch only day 06
    store.upsertPartitioned(spark, "t", batch(20250506, Seq("c" -> "z2", "d" -> "w")),
      Seq("k"), "p_date", numFiles = Some(1))
    val after = fileState(store, "t")

    val before05 = before.filter(_._1.contains("p_date=20250505"))
    val after05 = after.filter(_._1.contains("p_date=20250505"))
    assert(after05 == before05, "untouched partition changed on disk")
    assert(after.filter(_._1.contains("p_date=20250506")) !=
      before.filter(_._1.contains("p_date=20250506")))
    // and the merge really happened
    val got = store.read(spark, "t").collect()
      .map(r => r.getAs[String]("k") -> (r.getAs[String]("v"), r.getAs[Long]("nupdates"))).toMap
    assert(got == Map("a" -> ("x", 1L), "b" -> ("y", 1L),
      "c" -> ("z2", 2L), "d" -> ("w", 1L)))
  }

  test("the merge's target scan is partition-pruned (PartitionFilters in the plan)") {
    val store = freshStore()
    store.upsertPartitioned(spark, "t", batch(20250505, Seq("a" -> "x")), Seq("k"), "p_date")
    store.upsertPartitioned(spark, "t", batch(20250506, Seq("b" -> "y")), Seq("k"), "p_date")
    val p = store.prunedRead(spark, "t", "p_date", Seq(20250506))
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("p_date"), p.take(800))
    // pruning is real: only the matching partition's rows are read
    assert(store.prunedRead(spark, "t", "p_date", Seq(20250506)).count() == 1)
  }

  test("new partitions from a batch are created without touching existing ones") {
    val store = freshStore()
    store.upsertPartitioned(spark, "t", batch(20250505, Seq("a" -> "x")), Seq("k"), "p_date")
    val before = fileState(store, "t")
    store.upsertPartitioned(spark, "t", batch(20250507, Seq("n" -> "new")), Seq("k"), "p_date")
    val after = fileState(store, "t")
    assert(after.filter(_._1.contains("p_date=20250505")) ==
      before.filter(_._1.contains("p_date=20250505")))
    assert(after.keys.exists(_.contains("p_date=20250507")))
    assert(store.read(spark, "t").count() == 2)
  }

  test("compactPartitions folds only fragmented partitions; compact ones stay byte-identical") {
    val store = freshStore()
    // day 5 fragmented (plan-driven parallelism: 4 files), day 6 compact (1 file)
    store.upsertPartitioned(spark, "t",
      batch(5, Seq("a" -> "1", "b" -> "2", "c" -> "3", "d" -> "4")).repartition(4),
      Seq("k"), "p_date")
    store.upsertPartitioned(spark, "t", batch(6, Seq("x" -> "9")), Seq("k"), "p_date",
      numFiles = Some(1))
    def filesIn(part: String) = fileState(store, "t").keys.count(_.contains(part))
    assert(filesIn("p_date=5") > 1, "day 5 must start fragmented")
    assert(filesIn("p_date=6") == 1)
    val contentBefore = store.read(spark, "t").collect().map(_.toString).sorted.toSeq
    val day6Before = fileState(store, "t").filter(_._1.contains("p_date=6"))
    store.compactPartitions(spark, "t", "p_date", maxFiles = 1)
    assert(filesIn("p_date=5") == 1, "fragmented partition folds to one file")
    assert(fileState(store, "t").filter(_._1.contains("p_date=6")) == day6Before,
      "already-compact partition must not be touched")
    assert(store.read(spark, "t").collect().map(_.toString).sorted.toSeq == contentBefore)
    // idempotent: nothing fragmented left → second run is a no-op
    val s1 = fileState(store, "t")
    store.compactPartitions(spark, "t", "p_date", maxFiles = 1)
    assert(fileState(store, "t") == s1)
  }
}
