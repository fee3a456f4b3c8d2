package graft.functions

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Custom optimizer rule (SURVEY §7.2's `Rule[LogicalPlan]` extension
  * point): algebraic simplification of graft expressions —
  * `graft_hamming(x, x)` is identically 0 for any deterministic x, so fold
  * it to a literal before execution. Injected by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`); a no-op on plans that don't use the function.
  *
  * Null semantics are preserved: HammingDistance null-propagates, so for a
  * nullable child the fold must keep NULL→NULL rather than rewrite to 0.
  * Non-nullable children fold to a plain literal; nullable ones fold to
  * `if (isnull(x)) null else 0L`, which still removes the popcount work and
  * lets NullPropagation/later rules simplify further when nullability is
  * refined.
  */
object SimplifyGraftHamming extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance(l, r) if l.deterministic && l.semanticEquals(r) =>
        if (l.nullable) If(IsNull(l), Literal(null, LongType), Literal(0L, LongType))
        else Literal(0L, LongType)
    }
}
