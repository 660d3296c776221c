package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class BloomPruneSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("pruned join result is exactly the plain join (no false negatives)") {
    val s = spark; import s.implicits._
    val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
    val li = Tables.lineitem(s, dir)
    val pruned = BloomPrune.prunedEquiJoin(li, $"l_orderkey", urgent, "o_orderkey")
      .select($"l_orderkey", $"l_linenumber")
    val plain = li.join(urgent, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the probe filter actually prunes (fpp-bounded overshoot only)") {
    val s = spark; import s.implicits._
    val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
    val li = Tables.lineitem(s, dir)
    val bf = BloomPrune.buildFilter(urgent, "o_orderkey")
    val kept = BloomPrune.filterMightContain(li, $"l_orderkey", bf).count()
    val total = li.count()
    val trueMatch = li.join(urgent.select("o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(kept >= trueMatch, "bloom must have no false negatives")
    // ~20% of orders are urgent; with fpp=0.01 the kept fraction must
    // stay well under the full scan (generous bound for tiny sf)
    assert(kept < total * 6 / 10, s"pruning too weak: kept=$kept of $total")
  }

  test("bloom_might_contain is a plan-visible codegen predicate, below the join") {
    val s = spark; import s.implicits._
    val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
    val df = BloomPrune.prunedEquiJoin(
      Tables.lineitem(s, dir), $"l_orderkey", urgent, "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), "predicate must survive to the physical plan")
    // filter must sit on the probe scan side, not above the join:
    // the Filter node containing the predicate must come after (deeper
    // than) the join node in the plan tree string
    val joinIdx = plan.indexOf("Join")
    val predIdx = plan.indexOf("bloom_might_contain")
    assert(joinIdx >= 0 && predIdx > joinIdx,
      "bloom predicate should be below the join (on the scan side)")
  }

  test("SQL surface: bloom_might_contain resolves with a binary literal") {
    val s = spark; import s.implicits._
    val bf = BloomPrune.buildFilter(
      Tables.orders(s, dir).limit(100), "o_orderkey")
    val bytes = graft.functions.BloomMightContainFn.serialize(bf)
    graft.functions.Functions.register(s)
    val hits = Tables.orders(s, dir).limit(100)
      .select(call_function("bloom_might_contain", $"o_orderkey", lit(bytes)).as("hit"))
      .where($"hit").count()
    assert(hits == 100L, "every inserted key must hit")
  }
}
