package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: every `levenshtein(a, b) <= k` predicate gains the
  * free lower-bound guard `abs(length(a) - length(b)) <= k` as a leading
  * conjunct. Edit distance can never be less than the length difference,
  * so the rewrite is exactly value-preserving — but the guard is O(1)
  * integer math while levenshtein is an O(|a|·|b|) DP, and `And`
  * short-circuits, so candidate pairs that can't possibly match never pay
  * the DP. On a fuzzy-match pair join (f35 shape) this prunes most of the
  * quadratic candidate space; Catalyst may additionally push the guard
  * below the join when the lengths are projectable.
  *
  * Idempotent (fixed-point safe): the guard is only added when no
  * semantically-equal conjunct is already present. */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def guarded(cond: Expression): Expression = {
    val guards = cond.collect {
      case LessThanOrEqual(lev: Levenshtein, k) if k.foldable => guardFor(lev, k)
      case GreaterThanOrEqual(k, lev: Levenshtein) if k.foldable => guardFor(lev, k)
      case LessThan(lev: Levenshtein, k) if k.foldable => guardFor(lev, k)
      case GreaterThan(k, lev: Levenshtein) if k.foldable => guardFor(lev, k)
    }
    val missing = guards.filterNot(g => cond.exists(_.semanticEquals(g)))
    missing.foldRight(cond)(And(_, _))
  }

  // matches both shapes the predicate can end up in: a standalone Filter,
  // and a Join condition (predicate pushdown moves it there before
  // extraOptimizations run)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = guarded(cond)
      if (g fastEquals cond) f else Filter(g, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = guarded(cond)
      if (g fastEquals cond) j else j.copy(condition = Some(g))
  }
}
