package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Lower, StringTrim, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (the `Rule[LogicalPlan]` extension point,
  * SURVEY.md §4.3): collapse idempotent string-function chains —
  * `upper(upper(x)) → upper(x)`, same for lower/trim. Exactly
  * semantics-preserving (each is idempotent for every input, including
  * NULL), so it composes safely with the stock optimizer; chains like
  * these appear when views layer normalization over already-normalized
  * columns. Injected by [[GraftExtensions]]. */
object CollapseIdempotentStringFns extends Rule[LogicalPlan] {
  private def collapse(e: Expression): Expression = e.transformUp {
    case Upper(inner @ Upper(_)) => inner
    case Lower(inner @ Lower(_)) => inner
    case outer @ StringTrim(inner @ StringTrim(_, None), None) => inner
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => collapse(e) }
}
