package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BRound, Expression, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: collapse nested rounding when the outer scale is at
  * least as fine as the inner one — `round(round(x, d1), d2)` with
  * `d2 >= d1` is the identity on the outer call, whatever the rounding
  * modes, because the inner result carries at most d1 fractional digits
  * (exactly for decimals; for doubles via the shortest-repr semantics of
  * `BigDecimal.valueOf` that Spark's round uses).
  *
  * This shows up when grid-key normalization composes: operators that
  * each defensively `roundCoords` (reference: GLOFAS_PRECISION=3 rounding
  * before every join, discharge.py:265-270 / rp_thresholds.py:116-118)
  * stack `round(round(lat, 3), 3)` — at 100 TB the redundant pass is a
  * full extra scan-width of BigDecimal work in the hot path.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {

  private def scaleOf(e: Expression): Option[Int] = e match {
    case Literal(d: Int, IntegerType) => Some(d)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Round(inner @ Round(_, s1, _), s2, _)
          if scaleOf(s1).zip(scaleOf(s2)).exists { case (d1, d2) => d2 >= d1 } =>
        inner
      case Round(inner @ BRound(_, s1, _), s2, _)
          if scaleOf(s1).zip(scaleOf(s2)).exists { case (d1, d2) => d2 >= d1 } =>
        inner
      case BRound(inner @ Round(_, s1, _), s2, _)
          if scaleOf(s1).zip(scaleOf(s2)).exists { case (d1, d2) => d2 >= d1 } =>
        inner
      case BRound(inner @ BRound(_, s1, _), s2, _)
          if scaleOf(s1).zip(scaleOf(s2)).exists { case (d1, d2) => d2 >= d1 } =>
        inner
    }
}
