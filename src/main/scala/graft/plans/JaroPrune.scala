package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinklerExpr

/** Optimizer rule: in front of any `jaro_winkler(a, b) ≥ t` filter
  * conjunct with a high literal threshold, inject the PROVABLY sound
  * length-ratio prune so the O(len²) scorer never runs on pairs that
  * cannot pass — the hand-written prune of the x1_jaro_linkage plan
  * (DedupQueries), promoted to an automatic rewrite every SQL user
  * gets for free. This is the repo's `injectOptimizerRule` showcase:
  * whole-plan semantics that a scalar function alone cannot express.
  *
  * Soundness (same derivation as the hand prune, generalized to any
  * t): the Winkler boost is capped at ℓ≤4 · p=0.1, so
  * jw ≤ 0.4 + 0.6·jaro; and with m ≤ min(|a|,|b|) matched characters,
  * jaro ≤ (2 + min/max)/3. Chaining: jw ≥ t forces
  * min/max ≥ 3·(t − 0.4)/0.6 − 2 = 5t − 4. The conjunct
  * `least(la, lb) ≥ greatest(la, lb) · (5t − 4)` (byte lengths — the
  * scorer's own units) is therefore implied by the original predicate
  * and filters nothing that could qualify. Injected only when
  * 5t − 4 > 0 (t > 0.8); below that the bound is vacuous.
  *
  * The guard lands as the LEFT side of the conjunction, so conjunct
  * evaluation short-circuits on two octet_lengths before the dynamic-
  * programming scorer executes. Idempotent under the optimizer's
  * fixpoint loop: an already-present semantically-equal conjunct
  * suppresses re-injection. */
object JaroPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  private def boundFor(t: Double): Option[Double] = {
    val r = 5.0 * t - 4.0
    if (r > 0.0 && r <= 1.0) Some(r) else None
  }

  private def prune(a: Expression, b: Expression, r: Double): Expression = {
    val la = Cast(OctetLength(a), DoubleType)
    val lb = Cast(OctetLength(b), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)), Multiply(Greatest(Seq(la, lb)), Literal(r)))
  }

  /** (a, b, threshold) when the conjunct is a high-threshold
    * jaro_winkler comparison, in either orientation; `strict` (>) and
    * non-strict (≥) both imply the same non-strict bound. */
  private def jaroThreshold(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(JaroWinklerExpr(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
    case GreaterThan(JaroWinklerExpr(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinklerExpr(a, b)) => Some((a, b, t))
    case LessThan(Literal(t: Double, DoubleType), JaroWinklerExpr(a, b)) => Some((a, b, t))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts
        .flatMap(jaroThreshold)
        // the guard re-evaluates both operand expressions; duplicating
        // a NON-deterministic operand (e.g. built from rand()) would
        // give the guard and the scorer different values and change
        // filter semantics — inject only for deterministic operands
        .filter { case (a, b, _) => a.deterministic && b.deterministic }
        .flatMap { case (a, b, t) => boundFor(t).map(prune(a, b, _)) }
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      else Filter(And(additions.reduce(And), cond), child)
  }
}
