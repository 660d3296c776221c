package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class PercentilesSpec extends SparkSpec {

  test("sort-based exact percentiles are bit-identical to the built-in on testdata") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val sorted = Percentiles.exact(li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5, 0.9, 0.99), Seq("p50", "p90", "p99"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(sorted == builtin)
  }

  test("all-null group is kept with NULL percentile, like the built-in") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("g", "x")
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 2.0)
    assert(got(1).getString(0) == "b" && got(1).isNullAt(1))
    val builtin = df.groupBy($"g").agg(expr("percentile(x, 0.5)").as("p50"))
      .orderBy("g").collect()
    assert(builtin.length == 2 && builtin(1).isNullAt(1)) // same contract
  }

  test("integral position collapses to the exact rank value; nulls excluded") {
    val s = spark; import s.implicits._
    // 5 values: p=0.5 lands exactly on rank 2 (0-based) => 30.0, no interpolation
    val df = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(50.0), None)
      .toDF("x").withColumn("g", lit(1))
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5, 0.25), Seq("p50", "p25"))
      .collect().head
    assert(got.getDouble(1) == 30.0)
    assert(got.getDouble(2) == 20.0) // pos=1.0 exactly => value at rank 1
  }

  test("two-group interpolation matches hand computation") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0), ("b", 4.0), ("b", 8.0))
      .toDF("g", "x")
    val got = Percentiles.exact(df, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .orderBy("g").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 1.5)  // pos 0.5 between 1 and 2
    assert(got("b") == 3.0)  // pos 1.5 between 2 and 4
  }

  test("exactDistributed is bit-identical to the window form and the built-in (grouped)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ps = Seq(0.05, 0.5, 0.9, 0.99)
    val names = Seq("p05", "p50", "p90", "p99")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    val dist = rows(Percentiles.exactDistributed(li, Seq("l_returnflag"), "l_extendedprice", ps, names))
    val win = rows(Percentiles.exact(li, Seq("l_returnflag"), "l_extendedprice", ps, names))
    assert(dist == win)
  }

  test("exactDistributed global (no groups) equals the built-in percentile bit-for-bit") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val got = Percentiles.exactDistributed(o, Nil, "o_totalprice",
        Seq(0.25, 0.5, 0.75), Seq("q1", "q2", "q3"))
      .collect().head
    val builtin = o.agg(
        expr("percentile(o_totalprice, 0.25)"),
        expr("percentile(o_totalprice, 0.5)"),
        expr("percentile(o_totalprice, 0.75)"))
      .collect().head
    assert((got.getDouble(0), got.getDouble(1), got.getDouble(2)) ==
      (builtin.getDouble(0), builtin.getDouble(1), builtin.getDouble(2)))
  }

  test("exactDistributed: all-null group kept with NULL; ties across chunks are safe") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("g", "x")
    val got = Percentiles.exactDistributed(df, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 2.0)
    assert(got(1).getString(0) == "b" && got(1).isNullAt(1))
    // heavy ties: one value dominates, so range chunks split equal keys
    // arbitrarily — the selected value must still be exact
    val ties = (Seq.fill(500)(7.0) ++ Seq(1.0, 99.0)).map(("t", _)).toDF("g", "x")
    val t = Percentiles.exactDistributed(ties, Seq("g"), "x", Seq(0.5), Seq("p50"))
      .collect().head
    assert(t.getDouble(1) == 7.0)
  }

  test("restoreNullGroups=false: identical values, all-null groups absent, no extra scan") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None),
      ("c", Some(5.0))).toDF("g", "x")
    val fast = Percentiles.exactDistributed(df, Seq("g"), "x", Seq(0.5), Seq("p50"),
      restoreNullGroups = false).orderBy("g").collect()
    // exactly the non-null groups, same values as the restoring form
    assert(fast.map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(fast(0).getDouble(1) == 2.0 && fast(1).getDouble(1) == 5.0)
    // the restore's group-universe scan is gone: one scan of the input
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    def scans(restore: Boolean) = "FileScan parquet|LocalTableScan".r.findAllIn(
      Percentiles.exactDistributed(li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5), Seq("p50"), restoreNullGroups = restore)
        .queryExecution.executedPlan.toString).size
    assert(scans(restore = false) < scans(restore = true))
  }

  test("medianMad: fused window-minimax MAD is bit-identical to the two-round form") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val fused = Percentiles.medianMad(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val med = Percentiles.exactDistributed(li, Seq("l_returnflag"), "l_extendedprice",
      Seq(0.5), Seq("m"), restoreNullGroups = false)
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("ad", abs(col("l_extendedprice") - col("m")))
    val mad = Percentiles.exactDistributed(dev, Seq("l_returnflag"), "ad",
      Seq(0.5), Seq("mad"), restoreNullGroups = false)
    val rounds = med.join(mad, Seq("l_returnflag"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // == on doubles: IEEE-bit-identical, not approximately equal
    assert(fused == rounds)
  }

  test("medianMad adversarial geometries: n=1, even/odd, ties, negatives, skew") {
    val s = spark; import s.implicits._
    val cases = Seq(
      "single" -> Seq(7.0),
      "odd" -> Seq(1.0, 5.0, 100.0),
      "even" -> Seq(1.0, 2.0, 9.0, 10.0),
      "ties" -> Seq(3.0, 3.0, 3.0, 8.0, 8.0),
      "neg" -> Seq(-5.0, -1.0, 0.0, 2.0),
      // median window is NOT centered: all mass on one side
      "skew" -> Seq(0.0, 0.0, 0.0, 0.0, 50.0, 60.0, 70.0))
    val df = cases.flatMap { case (gname, vs) => vs.map(v => (gname, v)) }
      .toDF("g", "x").repartition(7)
    val fused = Percentiles.medianMad(df, Seq("g"), "x")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    cases.foreach { case (gname, vs) =>
      def medOf(xs: Seq[Double]): Double = {
        val s = xs.sorted
        val p = (s.length - 1) * 0.5
        val (lo, hi) = (s(p.toInt), s(math.ceil(p).toInt))
        if (p == math.floor(p)) lo else (math.ceil(p) - p) * lo + (p - math.floor(p)) * hi
      }
      val m = medOf(vs)
      val expect = (m, medOf(vs.map(v => math.abs(v - m))))
      assert(fused(gname) == expect, s"group $gname: ${fused(gname)} != $expect")
    }
  }

  test("medianMad plan: one range shuffle, no deviation re-sort") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = Percentiles.medianMad(li, Seq("l_returnflag"), "l_extendedprice")
      .queryExecution.executedPlan.toString
    // the two-round form pays two DISTINCT range exchanges (values,
    // then deviations); the fused pass has exactly one — it just
    // PRINTS several times because the persisted rank subplan is
    // repeated verbatim at every InMemoryTableScan
    val distinctRangeExchanges =
      "(?i)rangepartitioning\\([^)]*\\)".r.findAllIn(plan)
        .map(_.replaceAll("#\\d+", "")).toSet
    assert(distinctRangeExchanges.size == 1,
      s"deviation selection must reuse the value ranks, not re-range-shuffle: $distinctRangeExchanges")
    // and the rank pass IS reused through the cache, not recomputed
    assert(plan.contains("InMemoryTableScan"))
  }

  test("exactDistributed never sorts a whole group in one task (no unpartitioned data window)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = Percentiles.exactDistributed(li, Nil, "l_extendedprice", Seq(0.5), Seq("p50"))
      .queryExecution.executedPlan.toString
    // the data-side rank window is partitioned by the range-chunk id;
    // RangePartitioning must appear (the chunk exchange), and the only
    // windows over the fact rows carry a partition spec with pid
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"))
    assert(plan.contains("windowspecdefinition(pid"))
  }

  test("equiDepth matches a per-group sorted reference, sizes within one quantum") {
    val s = spark
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
    val b = 8
    val got = Percentiles.equiDepth(li, Seq("l_returnflag"), "l_extendedprice", b)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // reference: per-group sort in Scala, bucket = (rank·b) div n
    val raw = li.select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ref = raw.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length.toLong
      vs.zipWithIndex.map { case (v, i) => (g, i.toLong * b / n, v) }.toSeq
    }.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> ((ts.size.toLong, ts.map(_._3).min, ts.map(_._3).max))
    }
    assert(got == ref)
    // equal-frequency contract: within a group, bucket sizes differ by
    // at most ⌈n/b⌉ − ⌊n/b⌋ + boundary ties' rounding — here ≤ 1
    got.keys.map(_._1).toSet.foreach { g: String =>
      val sizes = got.collect { case ((gg, _), (n, _, _)) if gg == g => n }
      assert(sizes.max - sizes.min <= 1, s"group $g sizes: $sizes")
    }
  }

  test("lowerMedian: element-exact, long-typed, grouped/global, past 2^53") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 5L), ("a", 1L), ("a", 3L),
      ("b", 7L), ("b", 1L), ("b", 3L), ("b", 5L)).toDF("g", "x")
    // odd group: middle element; even group: LOWER median (an element,
    // not the 4.0 an interpolating median would produce)
    val got = Percentiles.lowerMedian(df, Seq("g"), "x", "m")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 3L)))
    // global: 1,1,3,3,5,5,7 → 0-based rank 3 → 3
    val glob = Percentiles.lowerMedian(df.select($"x"), Nil, "x", "m").collect()
    assert(glob.length == 1 && glob(0).getLong(0) == 3L)
    // keepType path: 2^53+1 is NOT double-representable — the double
    // projection would collapse it onto 2^53 and pick the wrong value
    val big = Seq(9007199254740993L, 9007199254740992L, 9007199254740995L).toDF("x")
    assert(Percentiles.lowerMedian(big, Nil, "x", "m").head.getLong(0)
      == 9007199254740993L)
  }
}
