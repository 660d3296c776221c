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

  test("SQL reads APPLY a pending MOR deletion vector (DvParquetTable); compaction restores the plain scan") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replace(s, "t4", (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    store.deleteWhereMor(s, "t4", $"k" <= 3, Seq("k"))
    // programmatic read applies the DV...
    assert(store.read(s, "t4").count() == 7)
    // ...and so does the SQL path now: the catalog serves the pending-
    // DV table through DvParquetTable — surviving rows only, never the
    // resurrected deletes, with no compaction required first
    // (right-to-be-forgotten contract, both read paths)
    assert(s.sql("SELECT count(*) AS n FROM graft.t4").head.getLong(0) == 7L)
    assert(s.sql("SELECT k FROM graft.t4 ORDER BY k").collect().map(_.getLong(0)).toSeq
      == (4L to 10L))
    // column-pruned and filtered reads still answer through the DV
    // (keys are force-included in the scan, then projected away)
    assert(s.sql("SELECT v FROM graft.t4 WHERE k = 2").count() == 0L)
    assert(s.sql("SELECT v FROM graft.t4 WHERE k = 5").head.getString(0) == "v5")
    // a second MOR delete composes (cumulative DV)
    store.deleteWhereMor(s, "t4", $"v" === "v9", Seq("k"))
    assert(s.sql("SELECT count(*) AS n FROM graft.t4").head.getLong(0) == 6L)
    store.compactDeletes(s, "t4")
    assert(s.sql("SELECT count(*) AS n FROM graft.t4").head.getLong(0) == 6L)
  }

  test("partitioned tables read through SQL with partition pruning; MOR DV applies in the scan") {
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
    // a pending partitioned MOR delete applies in the SQL scan too
    // (union of per-partition DV files — keys unique table-wide)
    store.deleteWhereMorPartitioned(s, "t5", $"k" === 6, Seq("k"), "p")
    assert(s.sql("SELECT count(*) AS n FROM graft.t5").head.getLong(0) == 39L)
    assert(s.sql("SELECT count(*) AS n FROM graft.t5 WHERE k = 6").head.getLong(0) == 0L)
    // partition pruning survives the DV wrapper
    val qe2 = s.sql("SELECT k FROM graft.t5 WHERE p = 2").queryExecution
    assert(qe2.executedPlan.toString.contains("PartitionFilters"), qe2.executedPlan.toString.take(800))
    assert(s.sql("SELECT count(*) AS n FROM graft.t5 WHERE p = 2").head.getLong(0) == 9L)
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

  test("VERSION AS OF k reads k commits back; retention bounds it; DV history serves surviving rows") {
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
    // a MOR delete against current leaves history readable, and the
    // DV'd version itself serves its SURVIVING rows through
    // DvParquetTable — each version owns its DV state
    store.deleteWhereMor(s, "t", col("k") === 2L, Seq("k"))
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 1") == Set(1L, 2L),
      "pre-delete history must stay readable")
    assert(ks("SELECT k FROM gtt.t VERSION AS OF 0") == Set(1L, 3L),
      "the DV-carrying version must serve surviving rows, not resurrect k=2")
  }

  test("SQL reads skip files through declared commit-time stats; answers exact") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.declareStats(s, "tstats", Seq("k"))
    store.replace(s, "tstats",
      s.range(0, 8000).select($"id".as("k"), ($"id" % 9).as("v"))
        .repartitionByRange(8, $"k").sortWithinPartitions($"k"))
    graft.operators.SkipStats.reset()
    val got = s.sql("SELECT k FROM graft.tstats WHERE k >= 100 AND k < 300 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (100L until 300L).toSeq, "SQL pruned read must be exact")
    val (listed, kept) = graft.operators.SkipStats.snapshot().collect {
      case (l, c) if l.startsWith("sql:tstats") => c }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(listed == 8L && kept < listed,
      s"a selective SQL range over 8 range-clustered files must skip files: $kept/$listed")
    // a filterless SQL scan reads everything, exactly
    assert(s.sql("SELECT count(*) AS n FROM graft.tstats").head.getLong(0) == 8000L)
    // a pending MOR DV routes back through the DV wrapper (no stats
    // pruning while deletes are unapplied) and stays exact
    store.deleteWhereMor(s, "tstats", $"k" === 150L, Seq("k"))
    assert(s.sql("SELECT count(*) AS n FROM graft.tstats WHERE k >= 100 AND k < 300")
      .head.getLong(0) == 199L)
  }

  test("partitioned SQL reads compose hive pruning with within-partition file skipping") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.declareStats(s, "pstats", Seq("k"))
    store.replacePartitions(s, "pstats",
      s.range(0, 9000).select($"id".as("k"), ($"id" % 3).cast("int").as("p"))
        .repartitionByRange(12, $"p", $"k").sortWithinPartitions($"p", $"k"),
      "p")
    graft.operators.SkipStats.reset()
    // data-range filter: every partition consulted, files skipped within
    val got = s.sql("SELECT k FROM graft.pstats WHERE k >= 300 AND k < 600 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (300L until 600L).toSeq)
    val (listed, kept) = graft.operators.SkipStats.snapshot().collect {
      case (l, c) if l.startsWith("sql:pstats") => c }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(kept < listed, s"within-partition SQL file skipping must engage: $kept/$listed")
    // mixed partition + data predicate stays exact
    assert(s.sql("SELECT count(*) AS n FROM graft.pstats WHERE p = 1 AND k < 90")
      .head.getLong(0) == (0L until 90L).count(_ % 3 == 1))
    // an all-pruned range still plans (one retained leaf) and answers 0
    assert(s.sql("SELECT count(*) AS n FROM graft.pstats WHERE k > 100000")
      .head.getLong(0) == 0L)
    // partitioned MOR DV routes through the DV wrapper, exact
    store.deleteWhereMorPartitioned(s, "pstats", $"k" === 301L, Seq("k"), "p")
    assert(s.sql("SELECT count(*) AS n FROM graft.pstats WHERE k >= 300 AND k < 600")
      .head.getLong(0) == 299L)
  }

  test("metadata-only aggregates: unfiltered COUNT/MIN/MAX answer from the sidecar, zero files read") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.declareStats(s, "tmeta", Seq("k", "w", "sv"))
    store.replace(s, "tmeta", s.range(0, 5000).select(
      $"id".as("k"),
      org.apache.spark.sql.functions.when($"id" % 7 === 0,
        org.apache.spark.sql.functions.lit(null)).otherwise($"id" % 100).as("w"),
      org.apache.spark.sql.functions.format_string("s%04d", $"id" % 50).as("sv"))
      .repartitionByRange(8, $"k"))
    graft.operators.SkipStats.reset()
    val q = s.sql("SELECT count(*) AS n, count(w) AS nw, min(k) AS lo, " +
      "max(k) AS hi, min(sv) AS slo, max(sv) AS shi FROM graft.tmeta")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"an unfiltered count/min/max must plan as a metadata-local scan:\n${plan.take(600)}")
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getString(5)) ==
      ((5000L, 5000L - 715L, 0L, 4999L, "s0000", "s0049")))
    val (listed, kept) = graft.operators.SkipStats.snapshot().collect {
      case (l, c) if l.startsWith("sql:tmeta") => c }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(listed >= 8L && kept == 0L, // build() may run once per (re)plan
      s"the metadata answer must open ZERO data files: $kept/$listed")
    // anything the sidecar cannot prove scans normally — and stays exact
    assert(s.sql("SELECT count(*) AS n FROM graft.tmeta WHERE k < 10").head.getLong(0) == 10L)
    assert(s.sql("SELECT count(DISTINCT w) AS n FROM graft.tmeta").head.getLong(0) == 100L)
    assert(s.sql("SELECT w, count(*) AS n FROM graft.tmeta GROUP BY w ORDER BY w")
      .count() == 101L)
    // an undeclared column's min/max falls back to the scan, exact
    // (sum is never metadata-answerable)
    assert(s.sql("SELECT sum(k) AS sk FROM graft.tmeta").head.getLong(0) ==
      (0L until 5000L).sum)
    // a pending MOR DV suspends the metadata path (the DV wrapper
    // serves) — counts reflect the delete, never the raw files
    store.deleteWhereMor(s, "tmeta", $"k" === 4999L, Seq("k"))
    val r2 = s.sql("SELECT count(*) AS n, max(k) AS hi FROM graft.tmeta").head
    assert((r2.getLong(0), r2.getLong(1)) == ((4999L, 4998L)))

    // PARTITIONED: per-leaf sidecars fold across partitions
    store.declareStats(s, "pmeta", Seq("k"))
    store.replacePartitions(s, "pmeta",
      s.range(0, 9000).select($"id".as("k"), ($"id" % 3).cast("int").as("p"))
        .repartitionByRange(12, $"p", $"k").sortWithinPartitions($"p", $"k"),
      "p")
    val q2 = s.sql("SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM graft.pmeta")
    assert(q2.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "partitioned metadata aggregate must plan locally")
    val r3 = q2.head
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2)) == ((9000L, 0L, 8999L)))
    // min/max/count of the PARTITION column fold from the dir names —
    // also metadata-only (hive partition values are never null)
    val q3 = s.sql("SELECT min(p) AS lo, max(p) AS hi, count(p) AS n FROM graft.pmeta")
    assert(q3.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "partition-column aggregates must fold from the dir names")
    assert(q3.head.toSeq == Seq(0, 2, 9000L))
  }

  test("SET/UNSET TBLPROPERTIES declare and withdraw stats/bloom capture; unknown keys refused") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.replace(s, "tprop", s.range(0, 2000)
      .select($"id".as("k"), (($"id" * 31L) % 2000L).as("id2"))
      .repartitionByRange(8, $"k"))
    s.sql("ALTER TABLE graft.tprop SET TBLPROPERTIES ('stats.cols' = 'k', 'bloom.cols' = 'id2')")
    assert(store.declaredStats(s, "tprop") == Seq("k"))
    assert(store.declaredBlooms(s, "tprop") == Seq("id2"))
    // SHOW TBLPROPERTIES introspects what was declared
    val shown = s.sql("SHOW TBLPROPERTIES graft.tprop").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("stats.cols").contains("k") &&
      shown.get("bloom.cols").contains("id2"), shown.toString)
    // effective from the NEXT commit: re-commit, then both prunings fire
    store.replace(s, "tprop", s.range(0, 2000)
      .select($"id".as("k"), (($"id" * 31L) % 2000L).as("id2"))
      .repartitionByRange(8, $"k"))
    graft.operators.SkipStats.reset()
    assert(s.sql("SELECT count(*) AS n FROM graft.tprop WHERE k < 100").head.getLong(0) == 100L)
    assert(s.sql("SELECT count(*) AS n FROM graft.tprop WHERE id2 = 31").head.getLong(0) == 1L)
    val (listed, kept) = graft.operators.SkipStats.snapshot().collect {
      case (l, c) if l.startsWith("sql:tprop") => c }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(kept < listed, s"SQL-declared stats+bloom must skip files: $kept/$listed")
    // UNSET withdraws capture for future commits; the committed version
    // keeps skipping through its own sidecar
    s.sql("ALTER TABLE graft.tprop UNSET TBLPROPERTIES ('stats.cols', 'bloom.cols')")
    assert(store.declaredStats(s, "tprop").isEmpty)
    assert(store.declaredBlooms(s, "tprop").isEmpty)
    store.replace(s, "tprop", s.range(0, 10).select($"id".as("k"), $"id".as("id2")))
    assert(s.sql("SELECT count(*) AS n FROM graft.tprop WHERE k < 5").head.getLong(0) == 5L)
    // unknown keys are refused loudly, not silently swallowed
    val e = intercept[Exception] {
      s.sql("ALTER TABLE graft.tprop SET TBLPROPERTIES ('zorder.cols' = 'k')")
    }
    assert(e.getMessage.contains("not recognized"), e.getMessage)
  }

  test("DESCRIBE STATS melts the committed sidecars; empty when nothing declared") {
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.declareStats(s, "tds", Seq("k"))
    store.declareBlooms(s, "tds", Seq("id"))
    store.replace(s, "tds", s.range(0, 4000)
      .select($"id".as("k"), (($"id" * 31L) % 4000L).as("id"))
      .repartitionByRange(4, $"k").sortWithinPartitions($"k"))
    val rows = s.sql("DESCRIBE STATS graft.tds").collect()
    // 4 files × 2 declared columns
    assert(rows.length == 8, rows.mkString("\n"))
    val byCol = rows.groupBy(_.getAs[String]("column"))
    assert(byCol("k").forall(r => r.getAs[String]("min") != null &&
      !r.getAs[Boolean]("bloom")))
    assert(byCol("id").forall(r => r.getAs[String]("min") == null &&
      r.getAs[Boolean]("bloom")))
    // rows repeats per (file, column): sum over one column's rows
    assert(byCol("k").map(_.getAs[Long]("rows")).sum == 4000L)
    // range-clustered on k: per-file [min,max] bands are disjoint
    val bands = byCol("k").map(r =>
      (r.getAs[String]("min").toLong, r.getAs[String]("max").toLong)).sorted
    assert(bands.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo
      case _ => true })
    // partitioned: one melt per leaf with the partition named
    store.declareStats(s, "pds", Seq("k"))
    store.replacePartitions(s, "pds", s.range(0, 600)
      .select($"id".as("k"), ($"id" % 3).cast("int").as("p")), "p")
    val prows = s.sql("DESCRIBE STATS graft.pds").collect()
    assert(prows.nonEmpty && prows.forall(_.getAs[String]("partition").startsWith("p=")))
    // nothing declared → empty, same shape
    store.replace(s, "tnone", Seq((1L, "a")).toDF("k", "v"))
    assert(s.sql("DESCRIBE STATS graft.tnone").collect().isEmpty)
  }

  test("SQL-path DPP: a partitioned stats table joined to a filtered dim prunes fact partitions at runtime") {
    // the V2 twin of StatsSkipSpec's DPP pin: our scan builder returns
    // the delegate FileScan, which implements SupportsRuntimeV2Filtering,
    // so Spark's dynamic partition pruning re-filters the fact's
    // partitions by the dim's broadcast result — with no extra code in
    // the wrapper. Pinned so a wrapper change cannot silently lose it.
    val s = spark; import s.implicits._
    val store = new TableStore(root)
    store.declareStats(s, "dppfact", Seq("k"))
    store.replacePartitions(s, "dppfact",
      s.range(0, 3000).select($"id".as("k"), ($"id" % 10).cast("int").as("day")),
      "day")
    val dimPath = Files.createTempDirectory(Paths.get("target"), "sqldppdim-").toString
    (0 until 10).map(d => (d, if (d < 2) "keep" else "drop")).toDF("day", "tag")
      .write.mode("overwrite").parquet(dimPath)
    s.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")
    val q = s.sql(
      """SELECT count(*) AS n FROM graft.dppfact f
        |JOIN dpp_dim d ON f.day = d.day WHERE d.tag = 'keep'""".stripMargin)
    assert(q.head.getLong(0) == 2L * 300L, "DPP join answer wrong")
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      "the V2 fact scan must carry a dynamic partition pruning filter:\n" +
        planStr.take(3000))
  }

}
