package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: in front of any `levenshtein(a, b) ≤ k` filter
  * conjunct, inject the PROVABLY sound length-difference prune so the
  * O(len²) dynamic program never runs on pairs that cannot pass —
  * JaroPruneRule's sibling for the built-in edit-distance scorer
  * (together they make the U4 injection surface a family, not a
  * one-off: any threshold comparison whose metric admits a cheap
  * lower bound gets the same treatment).
  *
  * Soundness: every edit is one insert/delete/substitute, and only
  * inserts/deletes change length, by exactly 1 — so
  * levenshtein(a, b) ≥ ||a| − |b|| (character lengths, the scorer's
  * own units). The conjunct `abs(length(a) − length(b)) ≤ k` is
  * therefore implied by `levenshtein(a, b) ≤ k` and filters nothing
  * that could qualify. `<` maps to the same bound with k − 1.
  *
  * The guard lands as the LEFT side of the conjunction, so conjunct
  * evaluation short-circuits on two lengths before the DP runs.
  * Determinism-gated like JaroPruneRule (the guard re-evaluates both
  * operands), and idempotent under the optimizer's fixpoint loop via
  * the semantic-equality suppression. */
object LevenshteinPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  private def prune(a: Expression, b: Expression, k: Int): Expression =
    LessThanOrEqual(
      Abs(Subtract(Length(a), Length(b))),
      Literal(k, IntegerType))

  /** (a, b, k) when the conjunct bounds a levenshtein distance above
    * by a non-negative integer literal, in either orientation. */
  private def levThreshold(e: Expression): Option[(Expression, Expression, Int)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) => Some((a, b, k))
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) => Some((a, b, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) => Some((a, b, k))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) => Some((a, b, k - 1))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts
        .flatMap(levThreshold)
        .filter { case (a, b, k) => k >= 0 && a.deterministic && b.deterministic }
        .map { case (a, b, k) => prune(a, b, k) }
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      else Filter(And(additions.reduce(And), cond), child)
  }
}
