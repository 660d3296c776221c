package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Invariants for the table-lifecycle queries (CDC apply, SCD2,
  * gap-fill, profiling) beyond the DuckDB hash gate: semantic
  * properties that must hold at any scale factor. */
class LifecycleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("s4_cdc_apply: deletes win, updates apply, untouched rows kept verbatim") {
    val out = LifecycleQueries.all("s4_cdc_apply")(spark, dir).collect()
    // latest change for keys % 6 == 0 is the seq-2 delete (unless a
    // seq-3 insert re-created it): no surviving row for such keys
    out.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      val op = r.getAs[String]("applied_op")
      if (k % 6 == 0)
        assert(op == "U", s"key $k survives a delete only via a later upsert")
      if (op == "K") assert(k % 2 != 0 && !(k % 6 == 0),
        s"key $k had a change but reports applied_op=K")
    }
    // every kept row matches the snapshot exactly
    val snapshot = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    out.filter(_.getAs[String]("applied_op") == "K").foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      assert(snapshot(k) == ((r.getAs[String]("o_orderstatus"), r.getAs[Double]("o_totalprice"))))
    }
  }

  test("s4_scd2_history: versions consecutive, intervals chain, exactly one current") {
    val rows = LifecycleQueries.all("s4_scd2_history")(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (ck, h) =>
      val sorted = h.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length).toSeq,
        s"custkey $ck: versions must be 1..n")
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1,
        s"custkey $ck: exactly one open interval")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Any]("valid_to") == b.getAs[Any]("valid_from"),
            s"custkey $ck: intervals must chain with no gap")
          assert(a.getAs[String]("o_orderpriority") != b.getAs[String]("o_orderpriority"),
            s"custkey $ck: consecutive versions must differ (no-op changes collapsed)")
        case _ =>
      }
    }
  }

  test("w6_gap_fill: dense calendar per user, counts conserved, fill persists") {
    val out = LifecycleQueries.all("w6_gap_fill")(spark, dir).collect()
    val span = out.map(_.getAs[Any]("day").toString).distinct.length
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      assert(rows.length == span, s"user $u: one row per calendar day")
      val sorted = rows.sortBy(_.getAs[Any]("day").toString)
      // once value_ff is non-null it stays non-null (forward fill)
      val firstSeen = sorted.indexWhere(!_.isNullAt(sorted.head.fieldIndex("value_ff")))
      if (firstSeen >= 0) sorted.drop(firstSeen).foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("value_ff")), s"user $u: fill must persist")
      }
    }
    val total = out.map(_.getAs[Long]("n_events")).sum
    val raw = Tables.events(spark, dir).filter(col("user_id") < 25).count()
    assert(total == raw, "gap-fill must conserve event counts")
  }

  test("a6_data_profile: one row per column, sane bounds, single scan") {
    val df = LifecycleQueries.all("a6_data_profile")(spark, dir)
    val out = df.collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") > 0L)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
    // fresh plan (an executed AQE plan's toString repeats the initial plan)
    val p = LifecycleQueries.all("a6_data_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "profiling must be one pass over the table, not a scan per column")
    assert(p.contains("Expand"), "multi-distinct must ride one Expand, not repeated scans")
  }

  test("a6_fd_discovery: holds iff zero violations, recomputation agrees, scans stay 2-column") {
    val out = LifecycleQueries.all("a6_fd_discovery")(spark, dir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert((r.getAs[Int]("holds") == 1) == (r.getAs[Long]("n_violating_lhs") == 0L))
      assert(r.getAs[Long]("max_rhs_per_lhs") >= 1L)
      assert(r.getAs[Long]("n_violating_lhs") <= r.getAs[Long]("n_lhs"))
    }
    // key-determined legs must hold at ANY scale factor (nationkey is
    // the PK; customer names embed the custkey, so they are unique)
    val byFd = out.map(r => r.getAs[String]("fd") -> r.getAs[Int]("holds")).toMap
    assert(byFd("nation: n_nationkey -> n_regionkey") == 1)
    assert(byFd("customer: c_name -> c_nationkey") == 1)
    // independent driver-side recomputation of one violating leg
    val pairs: Set[(Long, String)] = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSet
    val want: Iterable[Int] =
      pairs.groupBy(_._1).map { case (_, g) => g.size }
    val row = out.find(_.getAs[String]("fd") == "customer: c_nationkey -> c_mktsegment").get
    assert(row.getAs[Long]("n_lhs") == want.size)
    assert(row.getAs[Long]("n_violating_lhs") == want.count(_ > 1))
    assert(row.getAs[Long]("max_rhs_per_lhs") == want.max)
    // column pruning reaches every scan: each leg reads exactly its
    // two candidate columns, nothing else
    val p = LifecycleQueries.all("a6_fd_discovery")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("struct<n_nationkey:int,n_regionkey:int>"),
      "the nation leg must scan only (n_nationkey, n_regionkey)")
    assert(p.contains("struct<c_nationkey:int,c_mktsegment:string>"),
      "the customer leg must scan only (c_nationkey, c_mktsegment)")
  }

  test("a9_outliers: flag counts match an independent driver-side recomputation") {
    val got = LifecycleQueries.all("a9_outliers")(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_outliers")))).toMap
    val cents = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = cents.groupBy(_._1).map { case (flag, xs) =>
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val mean = v.sum / n  // exact: cents sum to integers, n small at sf0.001
      val varc = (v.map(x => x * x).sum - v.sum * v.sum / n) / (n - 1)
      flag -> ((n.toLong, v.count(x => math.abs(x - mean) > 3.0 * math.sqrt(varc)).toLong))
    }
    assert(got == want)
  }

  test("s4_cdc_apply: single key-shuffle family — no extra exchanges beyond window+join+sort") {
    val p = LifecycleQueries.all("s4_cdc_apply")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }
}
