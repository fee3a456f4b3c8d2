package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Custom optimizer rule (SURVEY §7.2's `Rule[LogicalPlan]` extension
  * point): algebraic simplification of graft expressions —
  * `graft_hamming(x, x)` is identically 0 for any deterministic x, so fold
  * it to a literal before execution. Injected by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`); a no-op on plans that don't use the function.
  */
object SimplifyGraftHamming extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance(l, r) if l.deterministic && l.semanticEquals(r) =>
        Literal(0L, LongType)
    }
}
