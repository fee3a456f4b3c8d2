package graft.functions

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, IsNull, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

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

/** Optimizer rule: rewrite bounded Levenshtein comparisons to the
  * THRESHOLDED form — `levenshtein(a, b) <= k` becomes
  * `levenshtein(a, b, k) >= 0`. Spark's thresholded implementation runs a
  * banded DP (O(k·n) and early exit) instead of the full O(n·m) matrix,
  * so users can write the natural predicate and still get the
  * string-similarity-join fast path (the hand-written form of this
  * rewrite is what `Dedup.d11` does explicitly).
  *
  * Value equivalence: thresholded levenshtein returns the distance when
  * it is ≤ k and −1 otherwise, so `dist <= k ⟺ dist_t(k) >= 0`; both
  * sides null-propagate identically. `<= 0` (and `< 1`) means string
  * equality — rewritten to `a = b`, which skips the DP entirely and can
  * further enable join-key extraction. Guarded to foldable non-negative
  * INT literals and un-thresholded calls only. */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  private def thresholded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(l.copy(threshold = Some(Literal(k))), Literal(0))
  private def rewrite(l: Levenshtein, k: Int): Expression =
    if (k == 0) EqualTo(l.left, l.right) else thresholded(l, k)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l: Levenshtein, Literal(k: Int, IntegerType))
          if l.threshold.isEmpty && k >= 0 => rewrite(l, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), l: Levenshtein)
          if l.threshold.isEmpty && k >= 0 => rewrite(l, k)
      case LessThan(l: Levenshtein, Literal(k: Int, IntegerType))
          if l.threshold.isEmpty && k >= 1 => rewrite(l, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), l: Levenshtein)
          if l.threshold.isEmpty && k >= 1 => rewrite(l, k - 1)
    }
}
