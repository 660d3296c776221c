package graft.operators

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ScaleOpsSpec extends SparkSpec {

  test("date-partitioned write prunes at the directory level") {
    val dir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "part-").toString
    Partitioning.writeDatePartitioned(
      Tables.orders(spark, "/root/testdata/sf0.001"), "o_orderdate", dir)
    val pruned = spark.read.parquet(dir).filter(col("p_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_year"), plan.take(600))
    val n95 = pruned.count()
    val nAll = spark.read.parquet(dir).count()
    assert(n95 > 0 && n95 < nAll)
  }

  test("sortedWrite: disjoint per-file key ranges (stats-based skipping layout)") {
    val dir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "sorted-").toString
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Partitioning.sortedWrite(src, "l_orderkey", dir, numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length == 4, s"expected 4 range files, got ${files.length}")
    // each file covers a key range disjoint from every other file —
    // the property parquet min/max stats exploit for file skipping
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey"), count(lit(1))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(ranges.map(_._3).sum == src.count(), "layout must preserve every row")
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"file ranges overlap: $a vs $b")
      case _ =>
    }
    // a point predicate prunes via stats: scan the sorted layout and
    // check Spark's parquet filter pushdown is in play
    val q = spark.read.parquet(dir).filter(col("l_orderkey") === ranges.head._1)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(l_orderkey)"),
      "predicate must reach the parquet scan")
    assert(q.count() > 0)
  }

  test("bucketed tables equi-join without a shuffle") {
    val s = spark
    Partitioning.writeBucketed(
      Tables.orders(s, "/root/testdata/sf0.001"), "b_orders", "o_orderkey", 8)
    Partitioning.writeBucketed(
      Tables.lineitem(s, "/root/testdata/sf0.001"), "b_lineitem", "l_orderkey", 8)
    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange; only the groupBy above it may
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Bucketed: true"), plan.take(1200))
  }

  // The runtime complement of static PartitionFilters: when the fact
  // filter arrives through a JOIN (dim lookup), Catalyst can only prune
  // at execution time, by turning the broadcast dim's key set into a
  // partition filter (DPP). At 100 TB this is the difference between
  // scanning one month and scanning ten years whenever the date
  // predicate lives on a dimension table.
  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory(Paths.get("target").toAbsolutePath, "dpp-").toString
    Partitioning.writeDatePartitioned(
      Tables.orders(spark, "/root/testdata/sf0.001"), "o_orderdate", dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real datasource scan: a LocalRelation folds the
    // filter away before the PartitionPruning rule looks for a
    // selective predicate on the dim side
    fact.select($"p_year").distinct().collect().map(_.getInt(0)).sorted
      .map(y => (y, if (y == 1995) "keep" else "drop")).toSeq.toDF("p_year", "tag")
      .write.mode("overwrite").parquet(s"$dir-dim")
    val dim = spark.read.parquet(s"$dir-dim")
    val joined = fact.join(dim.filter($"tag" === "keep"), Seq("p_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"), plan.take(1500))
    assert(joined.count() === fact.filter($"p_year" === 1995).count())
  }

  test("salted join returns exactly the plain join result") {
    val s = spark; import s.implicits._
    val large = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i)).toDF("k", "v")
    val small = Seq(("hot", 100), ("k1", 1), ("k2", 2)).toDF("k", "w")
    val plain = large.join(small, "k").select("k", "v", "w")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = Partitioning.saltedJoin(large, small, "k", buckets = 8)
      .select("k", "v", "w")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("asOf: latest build value at-or-before each probe, per key") {
    val s = spark; import s.implicits._
    def t(sec: Int) = Timestamp.valueOf(s"2025-05-05 10:00:${"%02d".format(sec)}")
    val probe = Seq((1L, t(5), "p1"), (1L, t(20), "p2"), (2L, t(10), "p3"), (3L, t(1), "p4"))
      .toDF("user_id", "ts", "tag")
    val build = Seq((1L, t(3), 30.0), (1L, t(5), 50.0), (1L, t(15), 150.0), (2L, t(11), 999.0))
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", Seq("value"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("p1").contains(50.0))  // inclusive: build at exactly t(5) wins
    assert(out("p2").contains(150.0))
    assert(out("p3").isEmpty)         // only later build rows for user 2
    assert(out("p4").isEmpty)         // no build rows for user 3
  }

  test("asOfNearest: closest build within tolerance, ties backward, LWW dedup") {
    val s = spark; import s.implicits._
    def t(sec: Int) = Timestamp.valueOf(s"2025-05-05 10:00:${"%02d".format(sec)}")
    val probe = Seq((1L, t(10), "p1"), (1L, t(30), "p2"), (2L, t(10), "p3"),
      (3L, t(10), "p4"), (4L, t(10), "p5"))
      .toDF("user_id", "ts", "tag")
    val build = Seq(
      (1L, t(7), 100L),   // 3s back from p1
      (1L, t(13), 200L),  // 3s fwd from p1 — exact tie: backward must win
      (1L, t(29), 300L),  // 1s back from p2
      (1L, t(29), 301L),  // same instant: LWW keeps max value (301)
      (2L, t(12), 400L),  // 2s fwd from p3, nearer than nothing backward
      (3L, t(40), 500L))  // 30s away from p4 — outside 5s tolerance
      .toDF("user_id", "ts", "bval")
    val out = AsOfJoin.asOfNearest(probe, build, "user_id", "ts", Seq("bval"), tolUs = 5000000L)
      .collect().map(r => (r.getString(2),
        (Option(r.get(3)).map(_.asInstanceOf[String]).orNull,
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(out("p1") == (("backward", Some(3000000L), Some(100L))))
    assert(out("p2") == (("backward", Some(1000000L), Some(301L))))
    assert(out("p3") == (("forward", Some(-2000000L), Some(400L))))
    assert(out("p4") == ((null, None, None)))   // outside tolerance
    assert(out("p5") == ((null, None, None)))   // no build rows at all
  }

  test("asOfNearest: random fixtures match the brute-force reference") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    def t(sec: Int) = Timestamp.valueOf(s"2025-05-05 10:${"%02d".format(sec / 60)}:${"%02d".format(sec % 60)}")
    for (trial <- 1 to 5) {
      val probes = (1 to 30).map(i =>
        (rnd.nextInt(4).toLong, t(rnd.nextInt(600)), s"p$trial-$i"))
      val builds = (1 to 40).map(_ =>
        (rnd.nextInt(4).toLong, t(rnd.nextInt(600)), rnd.nextInt(1000).toLong))
      val tol = 60000000L // 60 s
      val got = AsOfJoin.asOfNearest(
          probes.toDF("user_id", "ts", "tag"),
          builds.toDF("user_id", "ts", "bval"), "user_id", "ts", Seq("bval"), tol)
        .collect().map(r => r.getString(2) ->
          (Option(r.get(3)).map(_.asInstanceOf[String]),
            Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
      // brute force: LWW dedup per (key, ts) by max bval, then the
      // min-|Δ| candidate within tolerance, distance ties backward
      val lww = builds.groupBy(b => (b._1, b._2)).map { case (k, bs) =>
        (k._1, k._2, bs.map(_._3).max)
      }.toSeq
      probes.foreach { case (u, ts, tag) =>
        val cands = lww.filter(b => b._1 == u &&
          math.abs(b._2.getTime - ts.getTime) * 1000L <= tol)
        val expect =
          if (cands.isEmpty) (None, None)
          else {
            val best = cands.minBy(b => (math.abs(b._2.getTime - ts.getTime),
              if (b._2.getTime <= ts.getTime) 0 else 1))
            (Some(if (best._2.getTime <= ts.getTime) "backward" else "forward"),
              Some(best._3))
          }
        assert(got(tag) == expect, s"trial $trial probe $tag: ${got(tag)} vs $expect")
      }
    }
  }
}
