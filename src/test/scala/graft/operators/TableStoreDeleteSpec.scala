package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the DELETE verbs: SQL WHERE semantics (TRUE deletes; FALSE and
  * NULL keep), touched-partition-only rewrites, removal of partitions
  * the delete empties, and byte-identical untouched partitions. */
class TableStoreDeleteSpec extends SparkSpec {

  private def freshStore(): TableStore = {
    val dir = Files.createTempDirectory(Paths.get("target"), "dstore-")
    new TableStore(dir.toString)
  }

  private def rows(data: (String, Integer, Int)*) = {
    val s = spark; import s.implicits._
    data.toSeq.toDF("k", "x", "p")
  }

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
          try { val b = new Array[Byte](st.getLen.toInt); in.readFully(0, b); b }
          finally in.close()
        }
        out(st.getPath.toString.stripPrefix(root.toString)) =
          (st.getLen, st.getModificationTime, java.util.Arrays.hashCode(bytes))
      }
    }
    out.toMap
  }

  test("whole-table deleteWhere: TRUE rows go, FALSE and NULL-predicate rows stay") {
    val store = freshStore()
    store.replace(spark, "t", rows(("a", 1, 0), ("b", 2, 0), ("c", null, 0)))
    // pred is NULL for c (null x) — SQL DELETE keeps it
    store.deleteWhere(spark, "t", col("x") > 1)
    val got = store.read(spark, "t").collect().map(_.getAs[String]("k")).sorted.toSeq
    assert(got == Seq("a", "c"))
  }

  test("whole-table deleteWhere commits through the manifest (old version swapped out)") {
    val store = freshStore()
    store.replace(spark, "t", rows(("a", 1, 0), ("b", 2, 0)))
    val v0 = store.currentVersionId(spark, "t")
    store.deleteWhere(spark, "t", col("k") === "b")
    assert(store.currentVersionId(spark, "t") != v0)
    assert(store.read(spark, "t").count() == 1)
  }

  test("partitioned delete rewrites only matching partitions; untouched stay byte-identical") {
    val store = freshStore()
    store.replacePartitions(spark, "t",
      rows(("a", 1, 1), ("b", 2, 1), ("c", 3, 2), ("d", 4, 3)).repartition(1), "p")
    val before = fileState(store, "t")
    // matches only partition p=1
    store.deleteWherePartitioned(spark, "t", col("k") === "b", "p")
    val after = fileState(store, "t")
    assert(after.filter(_._1.contains("p=2")) == before.filter(_._1.contains("p=2")),
      "untouched partition p=2 changed on disk")
    assert(after.filter(_._1.contains("p=3")) == before.filter(_._1.contains("p=3")),
      "untouched partition p=3 changed on disk")
    assert(after.filter(_._1.contains("p=1")) != before.filter(_._1.contains("p=1")))
    val got = store.read(spark, "t").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Int]("p")).toMap
    assert(got == Map("a" -> 1, "c" -> 2, "d" -> 3))
  }

  test("a partition the delete empties is removed from the layout") {
    val store = freshStore()
    store.replacePartitions(spark, "t",
      rows(("a", 1, 1), ("b", 2, 2), ("c", 3, 2)).repartition(1), "p")
    store.deleteWherePartitioned(spark, "t", col("p") === 2, "p")
    val f = new Path(store.livePath("t"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(store.livePath("t"), "p=2")), "emptied partition dir survives")
    assert(f.exists(new Path(store.livePath("t"), "p=1")))
    assert(store.read(spark, "t").collect().map(_.getAs[String]("k")).toSeq == Seq("a"))
  }

  test("no-match delete is a no-op: zero rewrites, all files byte-identical") {
    val store = freshStore()
    store.replacePartitions(spark, "t", rows(("a", 1, 1), ("b", 2, 2)).repartition(1), "p")
    val before = fileState(store, "t")
    store.deleteWherePartitioned(spark, "t", col("x") > 99, "p")
    assert(fileState(store, "t") == before)
  }

  test("updateWhere: assignments see the OLD row; FALSE/NULL rows verbatim") {
    val store = freshStore()
    store.replace(spark, "t", rows(("a", 1, 0), ("b", 2, 0), ("c", null, 0)))
    // swap-style double assignment: x gets x+10 while k gets old x —
    // if assignments chained, k would see the updated x
    store.updateWhere(spark, "t", col("x") >= 1,
      Map("x" -> (col("x") + 10), "k" -> concat(col("k"), col("x"))))
    val got = store.read(spark, "t").collect()
      .map(r => (r.getAs[String]("k"), Option(r.getAs[Integer]("x")).map(_.toInt))).toSet
    assert(got == Set(("a1", Some(11)), ("b2", Some(12)), ("c", None)))
  }

  test("updateWhere rejects unknown SET columns") {
    val store = freshStore()
    store.replace(spark, "t", rows(("a", 1, 0)))
    intercept[IllegalArgumentException] {
      store.updateWhere(spark, "t", lit(true), Map("nope" -> lit(1)))
    }
  }

  test("partitioned update rewrites only matching partitions; partCol assignment rejected") {
    val store = freshStore()
    store.replacePartitions(spark, "t",
      rows(("a", 1, 1), ("b", 2, 2), ("c", 3, 3)).repartition(1), "p")
    val before = fileState(store, "t")
    store.updateWherePartitioned(spark, "t", col("k") === "b",
      Map("x" -> lit(99)), "p")
    val after = fileState(store, "t")
    assert(after.filter(_._1.contains("p=1")) == before.filter(_._1.contains("p=1")))
    assert(after.filter(_._1.contains("p=3")) == before.filter(_._1.contains("p=3")))
    val got = store.read(spark, "t").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Int]("x")).toMap
    assert(got == Map("a" -> 1, "b" -> 99, "c" -> 3))
    intercept[IllegalArgumentException] {
      store.updateWherePartitioned(spark, "t", lit(true), Map("p" -> lit(9)), "p")
    }
  }
}
