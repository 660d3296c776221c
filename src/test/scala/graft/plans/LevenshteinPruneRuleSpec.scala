package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the injected levenshtein prune: a `levenshtein ≤ k` filter
  * picks up the length-difference guard ahead of the DP scorer, the
  * strict form tightens to k − 1, the rewrite never changes answers
  * (the bound is implied: edits change length by at most 1 each), and
  * the optimizer's fixpoint loop doesn't stack duplicate guards. */
class LevenshteinPruneRuleSpec extends SparkSpec {

  // Range-backed (not a LocalRelation) so the Filter survives into the
  // optimized plan — the JaroPruneRuleSpec fixture discipline
  private def fixture = {
    val s = spark
    val as = array(lit("kitten"), lit("flaw"), lit("ab"), lit("same"))
    val bs = array(lit("sitting"), lit("lawn"), lit("abcdefghij"), lit("same"))
    // kitten/sitting dist 3 (cut at k=2); flaw/lawn dist 2 (survives);
    // ab vs abcdefghij len-diff 8 (prunable without running the DP)
    s.range(4).select(
      element_at(as, col("id").cast("int") + 1).as("a"),
      element_at(bs, col("id").cast("int") + 1).as("b"))
  }

  test("levenshtein(a,b) <= 2 gets exactly one length-difference guard, ahead of the scorer") {
    val df = fixture.filter(expr("levenshtein(a, b) <= 2"))
    val cond = df.queryExecution.optimizedPlan.toString
    // the filter pushes below the Project, so operands appear inlined
    assert(cond.contains("abs((length("), cond)
    // fixpoint-idempotent: one guard, not one per optimizer iteration
    assert("abs\\(".r.findAllIn(cond).size == 1, cond)
    // the guard short-circuits before the DP
    assert(cond.indexOf("abs(") < cond.indexOf("levenshtein"), cond)
  }

  test("strict < 3 injects the k=2 bound; reversed orientation matches too") {
    val c1 = fixture.filter(expr("levenshtein(a, b) < 3"))
      .queryExecution.optimizedPlan.toString
    assert(c1.contains("<= 2"), c1)
    val c2 = fixture.filter(expr("3 >= levenshtein(a, b)"))
      .queryExecution.optimizedPlan.toString
    assert(c2.contains("abs("), c2)
  }

  test("rewrite preserves answers (bound is implied, never filtering)") {
    val scored = fixture.select(col("a"), col("b"),
      expr("levenshtein(a, b)").as("d")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val expected = scored.filter(_._3 <= 2).map(t => (t._1, t._2)).toSet
    val got = fixture.filter(expr("levenshtein(a, b) <= 2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
    assert(got == Set(("flaw", "lawn"), ("same", "same")))
  }

  test("lower-bound comparisons (>=) are left alone — no sound prune exists there") {
    val cond = fixture.filter(expr("levenshtein(a, b) >= 2"))
      .queryExecution.optimizedPlan.toString
    assert(!cond.contains("abs("), cond)
  }
}
