package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.TableStore

import java.nio.file.{Files, Paths}

class GraftCatalogSpec extends SparkSpec {

  private lazy val root = {
    val dir = Files.createTempDirectory(Paths.get("target"), "catalog-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", dir)
    dir
  }

  test("SQL reads resolve the committed manifest snapshot") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replace(s, "t1", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(s.sql("SELECT count(*) AS n FROM graft.t1").head.getLong(0) == 2L)
    // a new commit is visible to the NEXT query
    store.replace(s, "t1", Seq((1L, "a")).toDF("k", "v"))
    assert(s.sql("SELECT count(*) AS n FROM graft.t1").head.getLong(0) == 1L)
    // predicates push into the underlying parquet scan
    val plan = s.sql("SELECT v FROM graft.t1 WHERE k = 1").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("IsNotNull(k)"), plan.take(800))
  }

  test("SHOW TABLES lists store tables; DROP TABLE removes one") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replace(s, "t2", Seq(1).toDF("x"))
    val names = s.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(names.contains("t2"), names)
    s.sql("DROP TABLE graft.t2")
    assert(!store.exists(s, "t2"))
    val after = s.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(!after.contains("t2"))
  }

  test("SQL reads refuse a pending MOR deletion vector; compaction restores them") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replace(s, "t4", (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    store.deleteWhereMor(s, "t4", $"k" <= 3, Seq("k"))
    // programmatic read applies the DV...
    assert(store.read(s, "t4").count() == 7)
    // ...but a raw parquet-path SQL scan cannot — it must refuse, not
    // resurrect the deleted rows (right-to-be-forgotten contract)
    val e = intercept[IllegalStateException] {
      s.sql("SELECT count(*) FROM graft.t4").head
    }
    assert(e.getMessage.contains("merge-on-read") && e.getMessage.contains("compactDeletes"),
      e.getMessage)
    store.compactDeletes(s, "t4")
    assert(s.sql("SELECT count(*) AS n FROM graft.t4").head.getLong(0) == 7L)
  }

  test("partitioned tables read through SQL with partition pruning; MOR refusal applies") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replacePartitions(s, "t5",
      (1 to 40).map(i => (i.toLong, i % 4, s"row$i")).toDF("k", "p", "payload")
        .repartition(col("p")), "p")
    assert(s.sql("SELECT count(*) AS n FROM graft.t5").head.getLong(0) == 40L)
    // partition predicate prunes at the source, not post-scan
    val qe = s.sql("SELECT k FROM graft.t5 WHERE p = 2").queryExecution
    assert(qe.executedPlan.toString.contains("PartitionFilters"), qe.executedPlan.toString.take(800))
    assert(s.sql("SELECT count(*) AS n FROM graft.t5 WHERE p = 2").head.getLong(0) == 10L)
    // a staged-but-uncommitted writer version is invisible: only
    // manifest leaf dirs are scanned
    store.deleteWhereMorPartitioned(s, "t5", $"k" === 6, Seq("k"), "p")
    val e = intercept[IllegalStateException] {
      s.sql("SELECT count(*) FROM graft.t5").head
    }
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
    store.compactDeletesPartitioned(s, "t5", "p")
    assert(s.sql("SELECT count(*) AS n FROM graft.t5").head.getLong(0) == 39L)
  }

  test("upserts through the store surface in SQL with counter semantics") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    val b = Seq((10L, "x")).toDF("k", "v")
    store.upsert(s, "t3", b, Seq("k"))
    store.upsert(s, "t3", b, Seq("k"))
    val r = s.sql("SELECT k, nupdates FROM graft.t3").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L)
  }

  test("VERSION AS OF k reads k commits back; retention bounds it; DV history refuses") {
    val s = spark; import s.implicits._
    // separate retained store under its own catalog name
    val dir = Files.createTempDirectory(Paths.get("target"), "catalog-tt-").toString
    s.conf.set("spark.sql.catalog.gtt", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gtt.root", dir)
    val store = new TableStore(dir, retain = 2)
    store.upsert(s, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.upsert(s, "t", Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    store.upsert(s, "t", Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    def ks(q: String): Set[Long] =
      s.sql(q).collect().map(_.getLong(0)).toSet
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 0") == Set(1L, 2L, 3L))
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 1") == Set(1L, 2L))
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 2") == Set(1L))
    // past retention: loud, names the chain depth
    val e = intercept[Exception](ks("SELECT k FROM gtt.t VERSION AS OF 3"))
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // a MOR delete against current leaves history readable; once the
    // DV'd version itself IS history, the SQL path refuses it
    store.deleteWhereMor(s, "t", col("k") === 2L, Seq("k"))
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 1") == Set(1L, 2L),
      "pre-delete history must stay readable")
    val e2 = intercept[Exception](ks("SELECT k FROM gtt.t VERSION AS OF 0"))
    assert(e2.getMessage.contains("deletion"), e2.getMessage)
  }
}
