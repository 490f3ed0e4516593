package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: every thresholded edit-distance predicate
  * `levenshtein(a, b) <= k` gets a conjoined cheap guard
  * `abs(length(a) - length(b)) <= k`.
  *
  * Sound because edit distance is bounded below by the length gap (every
  * insertion/deletion changes length by one, substitutions by zero), so
  * the guard can never reject a qualifying row. Profitable because the
  * guard is a codegen'd integer comparison evaluated BEFORE the O(|a|·|b|)
  * dynamic-programming kernel in the same conjunction (And short-circuits
  * left-to-right), and — unlike the levenshtein call — it is eligible for
  * scan-level pushdown of its length() halves. This is the blocking trick
  * [[graft.operators.Relational.fuzzyJoin]] applies by hand, made
  * automatic for any user query on the session.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * conf-built sessions and via `spark.experimental.extraOptimizations`
  * in `Engine.tune` for programmatic ones. Idempotent by construction
  * (the guard is only added while absent), so it is stable under the
  * optimizer's fixed-point batches.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] with PredicateHelper {

  // Only the UN-thresholded two-argument form may be guarded: the
  // three-argument levenshtein(a, b, t) returns -1 (not the distance)
  // when the distance exceeds t, so `levenshtein(a, b, t) <= k` is TRUE
  // for arbitrarily distant strings and a length guard would wrongly
  // drop them.
  private def guardFor(c: Expression): Option[Expression] = c match {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k))
    case LessThan(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), k))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k))
    case GreaterThan(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduce(And), child)
  }
}
