package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TableStore
import graft.sources.Tables

/** SQL MERGE INTO → TableStore.upsert lowering (plans/MergeIntoGraft):
  * the SQL verb must reproduce the programmatic merge exactly, refuse
  * unsupported merge shapes loudly, and leave non-graft targets to
  * Spark. */
class MergeIntoGraftSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def freshStore(tag: String): (String, TableStore) = {
    val path = java.nio.file.Files.createTempDirectory(s"sqlmerge-$tag").toString
    (path, new TableStore(path))
  }

  private def register(cat: String, path: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", path)
  }

  test("MERGE INTO graft table == programmatic upsert, nupdates included") {
    val o = Tables.orders(spark, dir)
    val seed = o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 2.0).as("o_totalprice"))

    val (sqlPath, sqlStore) = freshStore("sql")
    sqlStore.upsert(spark, "orders", seed, Seq("o_orderkey"))
    register("graft_mtest", sqlPath)
    updates.createOrReplaceTempView("mtest_updates")
    spark.sql("""MERGE INTO graft_mtest.orders t USING mtest_updates u
                |ON t.o_orderkey = u.o_orderkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val (_, progStore) = freshStore("prog")
    progStore.upsert(spark, "orders", seed, Seq("o_orderkey"))
    progStore.upsert(spark, "orders", updates, Seq("o_orderkey"))

    def canon(s: TableStore) = s.read(spark, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "nupdates")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(canon(sqlStore) == canon(progStore))
    // matched keys bumped to 2, unmatched stayed 1, inserts landed at 1
    assert(canon(sqlStore).exists(_._4 == 2L) && canon(sqlStore).exists(_._4 == 1L))
  }

  test("MERGE with USING <subquery> resolves at run time") {
    val (path, store) = freshStore("subq")
    import spark.implicits._
    store.upsert(spark, "kv",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    register("graft_msub", path)
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("msub_src")
    spark.sql("""MERGE INTO graft_msub.kv t
                |USING (SELECT k, upper(v) AS v FROM msub_src) u
                |ON t.k = u.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = store.read(spark, "kv").select("k", "v", "nupdates")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "C", 1L)))
  }

  test("unsupported merge shapes fail loudly, not silently half-merge") {
    val (path, store) = freshStore("bad")
    import spark.implicits._
    store.upsert(spark, "kv", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    register("graft_mbad", path)
    Seq((1L, "z")).toDF("k", "v").createOrReplaceTempView("mbad_src")
    // DELETE action: not the upsert contract
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO graft_mbad.kv t USING mbad_src u ON t.k = u.k
                  |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("UPDATE SET *"))
    // non-equi ON clause: not expressible as a keyed upsert
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO graft_mbad.kv t USING mbad_src u ON t.k < u.k
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("equi-terms"))
    // untouched by the failed statements
    assert(store.read(spark, "kv").count() == 1L)
  }

  test("SQL DELETE: TRUE rows go, FALSE and NULL-predicate rows survive") {
    val (path, store) = freshStore("del")
    import spark.implicits._
    store.upsert(spark, "kv",
      Seq((1L, Some(5L)), (2L, Some(50L)), (3L, None)).toDF("k", "v"), Seq("k"))
    register("graft_del", path)
    spark.sql("DELETE FROM graft_del.kv WHERE v > 10")
    val got = store.read(spark, "kv").select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L)) // NULL predicate row (k=3) survives
  }

  test("SQL UPDATE: every RHS evaluates against the OLD row (swap semantics)") {
    val (path, store) = freshStore("upd")
    import spark.implicits._
    store.upsert(spark, "ab", Seq((1L, 10L, 20L)).toDF("k", "a", "b"), Seq("k"))
    register("graft_upd", path)
    spark.sql("UPDATE graft_upd.ab SET a = b, b = a WHERE k = 1")
    val r = store.read(spark, "ab").select("a", "b").head
    assert((r.getLong(0), r.getLong(1)) == (20L, 10L)) // swapped, not chained
  }

  test("SQL DELETE/UPDATE strip alias and table qualifiers from references") {
    val (path, store) = freshStore("qual")
    import spark.implicits._
    store.upsert(spark, "kv",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    register("graft_qual", path)
    spark.sql("UPDATE graft_qual.kv AS t SET t.v = upper(t.v) WHERE t.k = 2")
    spark.sql("DELETE FROM graft_qual.kv t WHERE t.k = 1")
    val got = store.read(spark, "kv").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "B")))
  }

  test("INSERT OVERWRITE replaces atomically; plain INSERT INTO is refused") {
    val (path, store) = freshStore("ins")
    import spark.implicits._
    store.upsert(spark, "kv", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    register("graft_ins", path)
    Seq((9L, "z")).toDF("k", "v").createOrReplaceTempView("ins_src")
    spark.sql("INSERT OVERWRITE graft_ins.kv SELECT k, v FROM ins_src")
    val got = store.read(spark, "kv").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((9L, "z")))
    val e = intercept[UnsupportedOperationException] {
      spark.sql("INSERT INTO graft_ins.kv SELECT k, v FROM ins_src")
    }
    assert(e.getMessage.contains("MERGE INTO"))
  }

  test("CTAS creates and publishes; existing table fails unless IF NOT EXISTS") {
    val (path, store) = freshStore("ctas")
    register("graft_ctas", path)
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft_ctas.kv AS SELECT k, upper(v) AS v FROM ctas_src")
    val got = store.read(spark, "kv").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "A"), (2L, "B")))
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft_ctas.kv AS SELECT k, v FROM ctas_src")
    }
    // IF NOT EXISTS: no-op, original contents intact
    spark.sql("CREATE TABLE IF NOT EXISTS graft_ctas.kv AS SELECT 99 AS k, 'x' AS v")
    assert(store.read(spark, "kv").count() == 2L)
  }

  test("OPTIMIZE compacts to fewer files with identical content; ZORDER preserves content") {
    val (path, store) = freshStore("opt")
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i * 37 % 100).toInt, (i * 53 % 100).toInt))
      .toDF("k", "x", "y")
    store.replace(spark, "t", df.repartition(8))
    register("graft_opt", path)
    def content() = store.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    val before = content()
    val filesBefore = store.read(spark, "t").inputFiles.length
    spark.sql("OPTIMIZE graft_opt.t")
    assert(store.read(spark, "t").inputFiles.length < filesBefore)
    assert(content() == before)
    spark.sql("OPTIMIZE graft_opt.t ZORDER BY (x, y)")
    assert(content() == before)
    spark.sql("VACUUM graft_opt")
    assert(content() == before)
  }

  test("DESCRIBE HISTORY lists retained versions newest-first with commit meta") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-hist").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsert(spark, "kv", Seq((1L, "a")).toDF("k", "v"), Seq("k"), batchId = Some(7L))
    store.upsert(spark, "kv", Seq((2L, "b")).toDF("k", "v"), Seq("k"), batchId = Some(8L))
    store.upsert(spark, "kv", Seq((3L, "c")).toDF("k", "v"), Seq("k"), batchId = Some(9L))
    register("graft_hist", path)
    val rows = spark.sql("DESCRIBE HISTORY graft_hist.kv")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(5)))
    // retain = 2 keeps the current version plus two back
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.head._2 == "9") // batch-id replay watermark rides commit meta
    assert(rows.forall(!_._3))  // no pending deletion vectors
  }

  test("RESTORE re-commits an old version: history grows, both lineages readable, aliased DV write refused") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-restore").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    def batch(v: Int) = Seq((1L, s"s$v")).toDF("k", "s")
    store.upsert(spark, "t", batch(1), Seq("k"))
    store.upsert(spark, "t", batch(2), Seq("k"))
    store.upsert(spark, "t", batch(3), Seq("k"))
    register("graft_rstspec", path)
    val before = store.history(spark, "t").map(_.version)

    spark.sql("RESTORE TABLE graft_rstspec.t TO VERSION AS OF 2")

    // current state == the state 2 commits back (the first batch)
    val cur = store.read(spark, "t").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(cur.toSeq == Seq(("s1", 1L)))
    // history GREW (never truncates): restored dir in BOTH positions
    val after = store.history(spark, "t")
    assert(after.length == 4)
    assert(after.head.version == before(2))
    assert(after.map(_.version).tail == before)
    assert(spark.sql("DESCRIBE HISTORY graft_rstspec.t").count() == 4L)
    // the pre-restore current is still readable one step back
    val prev = store.readVersionsBack(spark, "t", 1)
      .collect().map(r => r.getString(1))
    assert(prev.toSeq == Seq("s3"))
    // in-place DV mutation of the aliased dir would rewrite history:
    // refused loudly until a data commit re-separates the lineages
    val e = intercept[IllegalArgumentException] {
      store.deleteWhereMor(spark, "t", col("k") === 1L, Seq("k"))
    }
    assert(e.getMessage.contains("aliased by a RESTORE"))
    store.upsert(spark, "t", batch(4), Seq("k")) // fresh dir at the head
    store.deleteWhereMor(spark, "t", col("k") === 999L, Seq("k")) // resumes
    assert(store.read(spark, "t").collect().map(_.getString(1)).toSeq == Seq("s4"))
  }

  test("VERSION AS OF '<tag>': SQL serves the pinned state, captured DV applied; misses are loud") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-tag").toString
    val store = new TableStore(path)
    import spark.implicits._
    store.upsert(spark, "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), Seq("k"))
    store.deleteWhereMor(spark, "t", col("k") === 1L, Seq("k"))
    store.tagSnapshot(spark, "rel", Seq("t")) // pins {2, 3} (DV = {1})
    // mutate past the tag: the same version dir's DV grows in place,
    // then a data commit displaces it entirely
    store.deleteWhereMor(spark, "t", col("k") === 2L, Seq("k"))
    store.upsert(spark, "t", Seq((9L, "z")).toDF("k", "s"), Seq("k"))
    register("graft_tagspec", path)
    val got = spark.sql("SELECT k FROM graft_tagspec.t VERSION AS OF 'rel'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L),
      "the SQL tag read must apply the tag-time DV, not the later one")
    // unknown tag and uncovered table are loud
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql("SELECT * FROM graft_tagspec.t VERSION AS OF 'nope'").collect()
    }
    assert(e1.getMessage.contains("no snapshot tag"))
    // a PARTITIONED capture refuses the raw-path SQL read with the hint
    store.upsertPartitioned(spark, "pt",
      Seq((1L, "a", 5)).toDF("k", "v", "p_date"), Seq("k"), "p_date")
    store.tagSnapshot(spark, "prel", Seq("pt"))
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("SELECT * FROM graft_tagspec.pt VERSION AS OF 'prel'").collect()
    }
    assert(e2.getMessage.contains("readTag"))
    // SHOW TAGS lists the inventory
    assert(spark.sql("SHOW TAGS graft_tagspec").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("prel", "rel"))
  }

  test("mode guards: cross-mode writes refuse loudly; OPTIMIZE routes by committed mode") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-modes").toString
    val store = new TableStore(path)
    import spark.implicits._
    // a whole-table commit against a partitioned table would be
    // INVISIBLE behind the _pmanifest (and the legacy cleanup would
    // collect partition dirs as debris) — must refuse, not corrupt
    store.replacePartitions(spark, "pt",
      Seq((1, "a", 5), (2, "b", 6)).toDF("k", "v", "p_date"), "p_date")
    val e1 = intercept[IllegalArgumentException] {
      store.replace(spark, "pt", Seq((9, "x")).toDF("k", "v"))
    }
    assert(e1.getMessage.contains("partitioned mode"))
    assert(store.read(spark, "pt").count() == 2L, "refusal must leave the table intact")
    // ...and the mirror: a partitioned commit against a whole-table chain
    store.upsert(spark, "wt", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      store.replacePartitions(spark, "wt",
        Seq((1L, "a", 5)).toDF("k", "v", "p_date"), "p_date")
    }
    assert(e2.getMessage.contains("whole-table versioned mode"))
    // OPTIMIZE resolves the right maintenance verb per mode
    register("graft_modes", path)
    spark.sql("OPTIMIZE graft_modes.pt") // partitioned → compactPartitions
    assert(store.read(spark, "pt").collect().map(_.getString(1)).sorted.toSeq ==
      Seq("a", "b"))
    spark.sql("OPTIMIZE graft_modes.pt ZORDER BY (k, p_date)") // partitioned zorder
    assert(store.read(spark, "pt").count() == 2L)
    store.append(spark, "feed", Seq((1L, "a")).toDF("k", "v"))
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql("OPTIMIZE graft_modes.feed")
    }
    assert(e3.getMessage.contains("compactAppend"),
      "append-only OPTIMIZE must point at the watermark-aware verb")
  }

  test("PURGE HISTORY: folds the pending DV, truncates the chain; bytes and time travel both gone") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-purge").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsert(spark, "t", Seq((1L, "keep"), (2L, "erase")).toDF("k", "s"), Seq("k"))
    store.upsert(spark, "t", Seq((3L, "keep2")).toDF("k", "s"), Seq("k"))
    store.deleteWhereMor(spark, "t", col("s") === "erase", Seq("k"))
    register("graft_purge", path)
    // pre-purge: the erased row's bytes are physically present (MOR),
    // and time travel serves the pre-delete state
    assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$path/t")
      .filter(col("s") === "erase").count() >= 1L)
    assert(store.history(spark, "t").length == 2)

    spark.sql("PURGE HISTORY graft_purge.t")

    assert(store.history(spark, "t").length == 1)
    intercept[IllegalArgumentException] {
      store.readVersionsBack(spark, "t", 1).count()
    }
    assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$path/t")
      .filter(col("s") === "erase").count() == 0L,
      "purge must physically remove erased bytes")
    assert(store.read(spark, "t").collect().map(_.getString(1)).sorted.toSeq ==
      Seq("keep", "keep2"))
    // RESTORE now has nothing to reach
    intercept[IllegalArgumentException] {
      store.restore(spark, "t", 1)
    }
  }

  test("RESTORE TO VERSION AS OF 0 is an explicit no-op, not an alias commit") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-restore0").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    store.restore(spark, "t", 0)
    // history unchanged (no self-alias), and a MOR delete is NOT
    // locked out afterwards (ADVICE r10: the alias guard must not
    // fire on an undo of nothing)
    assert(store.history(spark, "t").length == 1)
    store.deleteWhereMor(spark, "t", col("k") === 1L, Seq("k"))
    assert(store.read(spark, "t").count() == 0L)
  }

  test("PARTITIONED RESTORE: history grows, state rolls back, untouched partitions byte-identical") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-restore-part").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    def batch(p: Int, v: String) = Seq((p.toLong, v, p)).toDF("k", "s", "pc")
    // three data commits: p=1 seeded, then p=2, then p=2 updated
    store.upsertPartitioned(spark, "t", batch(1, "one"), Seq("k"), "pc")
    store.upsertPartitioned(spark, "t", batch(2, "two"), Seq("k"), "pc")
    val p1Before = store.partitionedLeafPaths(spark, "t").get.filter(_.contains("pc=1"))
    store.upsertPartitioned(spark, "t", batch(2, "TWO"), Seq("k"), "pc")
    assert(store.versionDepth(spark, "t") == 3)
    def state() = store.read(spark, "t").select("k", "s", "nupdates")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

    // time travel reaches every retained generation
    assert(store.readVersionsBack(spark, "t", 2).select("s")
      .collect().map(_.getString(0)).toSeq == Seq("one"))
    val preRestore = state()
    assert(preRestore == Seq((1L, "one", 1L), (2L, "TWO", 2L)))

    register("graft_rstpart", path)
    spark.sql("RESTORE TABLE graft_rstpart.t TO VERSION AS OF 1")
    // state rolled back one data commit; history GREW
    assert(state() == Seq((1L, "one", 1L), (2L, "two", 1L)))
    assert(store.versionDepth(spark, "t") == 4)
    assert(spark.sql("DESCRIBE HISTORY graft_rstpart.t").count() == 4L)
    // the pre-restore head is readable one step back (both lineages)
    assert(store.readVersionsBack(spark, "t", 1).select("s")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("TWO", "one"))
    // untouched partition p=1: same version dir through all commits
    // AND the restore — its files never moved
    assert(store.partitionedLeafPaths(spark, "t").get.filter(_.contains("pc=1")) == p1Before)
    // MOR delete after a partitioned restore lands in the HEAD only
    // (DV files are manifest-listed per state, so history reads are
    // untouched — no alias guard needed in partitioned mode)
    store.deleteWhereMorPartitioned(spark, "t", col("k") === 2L, Seq("k"), "pc")
    assert(state() == Seq((1L, "one", 1L)))
    assert(store.readVersionsBack(spark, "t", 1).count() == 2L)
    // a new data commit re-applies the retention window
    store.upsertPartitioned(spark, "t", batch(3, "three"), Seq("k"), "pc")
    assert(store.versionDepth(spark, "t") == 3) // head + retain=2
  }

  test("partitioned RESTORE across a widen: each state reads with its own schema") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-rstwide").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsertPartitioned(spark, "t",
      Seq((1L, "a", 0)).toDF("k", "v", "pc"), Seq("k"), "pc")
    store.widenPartitioned(spark, "t", Map("score" -> lit(null).cast("double")), "pc")
    assert(store.read(spark, "t").columns.contains("score"))
    // the pre-widen generation serves its own (narrow) schema
    assert(!store.readVersionsBack(spark, "t", 1).columns.contains("score"))
    store.restore(spark, "t", 1)
    // restored current is narrow again; the widened head is one back
    assert(!store.read(spark, "t").columns.contains("score"))
    assert(store.readVersionsBack(spark, "t", 1).columns.contains("score"))
  }

  test("TIMESTAMP AS OF resolves through manifest-stamped commit times") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-ts").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "s"), Seq("k"))
    store.upsert(spark, "t", Seq((1L, "b")).toDF("k", "s"), Seq("k"))
    store.upsert(spark, "t", Seq((1L, "c")).toDF("k", "s"), Seq("k"))
    val ts = store.commitTimestamps(spark, "t").map(_.get)
    assert(ts.length == 3 && ts == ts.sorted.reverse) // newest first, monotone
    // exact commit instant → that version; between commits → the
    // EARLIER version (the one current then); current for "now"
    assert(store.stepsBackAsOf(spark, "t", ts(1)) == 1)
    assert(store.stepsBackAsOf(spark, "t", ts(2)) == 2)
    assert(store.stepsBackAsOf(spark, "t", System.currentTimeMillis() + 1000) == 0)
    // before the first retained commit: loud error, no silent guess
    intercept[IllegalArgumentException] {
      store.stepsBackAsOf(spark, "t", ts(2) - 1)
    }
    // the SQL surface: TIMESTAMP AS OF == VERSION AS OF at that instant
    register("graft_tstrav", path)
    // ISO-8601 UTC literal — session TZ is UTC, so no JVM-default skew
    val tsLit = java.time.Instant.ofEpochMilli(ts(1)).toString
    assert(spark.sql(s"SELECT s FROM graft_tstrav.t TIMESTAMP AS OF '$tsLit'")
      .head().getString(0) == "b")
    assert(spark.sql("SELECT s FROM graft_tstrav.t VERSION AS OF 1")
      .head().getString(0) == "b")
  }

  test("append-only mode: declared INSERT INTO appends batch partitions; undeclared refused; replay guarded") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-append").toString
    val store = new TableStore(path)
    import spark.implicits._
    register("graft_appspec", path)
    spark.conf.set("spark.sql.catalog.graft_appspec.appendOnly", "feed")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("appspec_b0")
    Seq((3L, "c")).toDF("k", "v").createOrReplaceTempView("appspec_b1")
    spark.sql("INSERT INTO graft_appspec.feed SELECT * FROM appspec_b0")
    spark.sql("INSERT INTO graft_appspec.feed SELECT * FROM appspec_b1")
    val got = store.read(spark, "feed").select("k", "v", "_ab")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)))
    // replay guard: the same batch id applies once
    store.append(spark, "feed", Seq((4L, "d")).toDF("k", "v"), batchId = Some(9L))
    store.append(spark, "feed", Seq((4L, "d")).toDF("k", "v"), batchId = Some(9L))
    assert(store.read(spark, "feed").filter(col("k") === 4L).count() == 1L)
    // incremental consumers: _ab > watermark partition-prunes
    assert(store.read(spark, "feed").filter(col("_ab") > 1L).count() == 1L)
    // undeclared tables keep the refusal, with the declaration hint
    val e = intercept[UnsupportedOperationException] {
      spark.sql("INSERT INTO graft_appspec.other SELECT * FROM appspec_b0")
    }
    assert(e.getMessage.contains("appendOnly"))
    // append into a keyed table is refused loudly
    store.upsert(spark, "kv", Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      store.append(spark, "kv", Seq((2L, "y")).toDF("k", "v"))
    }
    assert(e2.getMessage.contains("append-only"))
  }

  test("ALTER TABLE ADD COLUMNS widens whole-table AND partitioned stores; other changes refused") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-alter").toString
    val store = new TableStore(path, retain = 1)
    import spark.implicits._
    register("graft_alt", path)
    spark.conf.set("spark.sql.catalog.graft_alt.retain", "1")
    // whole-table: one atomic replace, old version keeps the old schema
    store.upsert(spark, "t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    spark.sql("ALTER TABLE graft_alt.t ADD COLUMNS (score DOUBLE, tag STRING)")
    val widened = store.read(spark, "t")
    assert(widened.columns.toSeq == Seq("k", "v", "nupdates", "score", "tag"))
    assert(widened.head().isNullAt(3) && widened.head().isNullAt(4))
    assert(!store.readVersionsBack(spark, "t", 1).columns.contains("score"))
    // partitioned: the widenPartitioned sweep under one atomic commit
    store.upsertPartitioned(spark, "p",
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("k", "v", "pc"), Seq("k"), "pc")
    spark.sql("ALTER TABLE graft_alt.p ADD COLUMNS (score DOUBLE)")
    val p = store.read(spark, "p")
    assert(p.columns.contains("score") && p.filter(col("score").isNotNull).count() == 0L)
    assert(p.count() == 2L)
    // writes against the widened schema land
    store.upsert(spark, "t", Seq((2L, "b", 1L, 0.5, "x")).toDF("k", "v", "nupdates", "score", "tag")
      .select(col("k"), col("v"), col("score"), col("tag")), Seq("k"))
    assert(store.read(spark, "t").filter(col("k") === 2L).head().getDouble(3) == 0.5)
    // everything that is not a top-level ADD COLUMN keeps the refusal
    intercept[Exception] { spark.sql("ALTER TABLE graft_alt.t DROP COLUMN tag") }
    intercept[Exception] { spark.sql("ALTER TABLE graft_alt.t RENAME COLUMN tag TO t2") }
  }

  test("partitioned timestamp travel: #ts generations resolve instants; MOR deletes keep the data commit's time") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-pts").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    def b(v: String, pc: Int) = Seq((1L, v, pc)).toDF("k", "s", "pc")
    store.upsertPartitioned(spark, "t", b("s1", 0), Seq("k"), "pc")
    store.upsertPartitioned(spark, "t", b("s2", 0), Seq("k"), "pc")
    store.upsertPartitioned(spark, "t", b("s3", 0), Seq("k"), "pc")
    val ts = store.commitTimestamps(spark, "t").map(_.get)
    assert(ts.length == 3 && ts == ts.sorted.reverse)
    assert(store.stepsBackAsOf(spark, "t", ts(1)) == 1)
    assert(store.readVersionsBack(spark, "t",
      store.stepsBackAsOf(spark, "t", ts(2))).select("s").head().getString(0) == "s1")
    intercept[IllegalArgumentException] { store.stepsBackAsOf(spark, "t", ts(2) - 1) }
    // a MOR delete is not a data commit: the head keeps the data
    // commit's stamp, so timestamp resolution is unaffected
    store.deleteWhereMorPartitioned(spark, "t", col("k") === 999L, Seq("k"), "pc")
    assert(store.commitTimestamps(spark, "t").map(_.get) == ts)
  }

  test("catalog retain conf: a pure-SQL write flow keeps history for VERSION AS OF and RESTORE") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-retain").toString
    register("graft_ret", path)
    spark.conf.set("spark.sql.catalog.graft_ret.retain", "2")
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "s").createOrReplaceTempView("ret_b1")
    Seq((1L, "b")).toDF("k", "s").createOrReplaceTempView("ret_b2")
    spark.sql("CREATE TABLE graft_ret.kv AS SELECT k, s FROM ret_b1")
    spark.sql("""MERGE INTO graft_ret.kv t USING ret_b2 u ON t.k = u.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // retain=2 through the SQL write path: both commits readable
    assert(spark.sql("DESCRIBE HISTORY graft_ret.kv").count() == 2L)
    assert(spark.sql("SELECT s FROM graft_ret.kv VERSION AS OF 1")
      .head().getString(0) == "a")
    spark.sql("RESTORE TABLE graft_ret.kv TO VERSION AS OF 1")
    assert(spark.sql("SELECT s FROM graft_ret.kv").head().getString(0) == "a")
    assert(spark.sql("DESCRIBE HISTORY graft_ret.kv").count() == 3L)
  }

  test("RESTORE to a DV-carrying version composes: the restored read applies the DV") {
    val path = java.nio.file.Files.createTempDirectory("sqlmerge-restore-dv").toString
    val store = new TableStore(path, retain = 2)
    import spark.implicits._
    store.upsert(spark, "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"))
    store.deleteWhereMor(spark, "t", col("k") === 2L, Seq("k")) // DV on v1
    store.upsert(spark, "t", Seq((4L, "d")).toDF("k", "v"), Seq("k")) // v2
    register("graft_rstdv", path)
    spark.sql("RESTORE TABLE graft_rstdv.t TO VERSION AS OF 1")
    // the restored current serves v1's SURVIVING rows (DV applied)
    assert(store.read(spark, "t").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("OPTIMIZE on a non-graft name falls through to Spark's own parser error") {
    intercept[Exception] { spark.sql("OPTIMIZE some_other.t") }
    // and the failure is Spark's parse error, not a graft command
    val e = intercept[Exception] { spark.sql("OPTIMIZE some_other.t") }
    assert(!String.valueOf(e.getMessage).toLowerCase.contains("graft"))
  }

  test("non-graft MERGE targets pass through to Spark untouched") {
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("plain_target")
    Seq((1L, "z")).toDF("k", "v").createOrReplaceTempView("plain_src")
    // Spark rejects MERGE into a temp view with ITS OWN error — proof
    // the statement was not claimed by the graft rewrite
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO plain_target t USING plain_src u ON t.k = u.k
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(!e.isInstanceOf[UnsupportedOperationException] ||
      !String.valueOf(e.getMessage).contains("graft"))
  }
}
