package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §7.2 path (c)): top-k rows per
  * group as a custom `LogicalPlan` + `SparkStrategy` + physical operators.
  *
  * WHY a custom operator: the naive reading of the stock formulation
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`, see Relational.w2)
  * shuffles every row; Spark ≥3.5 mitigates this itself with
  * `InferWindowGroupLimit`, whose partial `WindowGroupLimit` prunes to k
  * per (partition, group) pre-exchange — but it does so by SORTING each
  * partition, then sorts again and re-runs the rank post-shuffle. This
  * operator replaces both sorted passes with bounded HEAPS (O(n log k)
  * scan, no partition sort, no rank columns materialized): the exchange
  * carries the same ≤ k·|groups| rows per partition, and the reduce side
  * merges heaps instead of sorting ([[TopKFinalExec]]) — the partial/final
  * split Spark uses for aggregates, applied to a rank filter. The planner
  * inserts the hash exchange between the two because the final node
  * declares `ClusteredDistribution` over the group keys.
  * [[RewriteRankFilterToTopK]] (opt-in) routes the stock idiom here
  * automatically, unwrapping any WindowGroupLimit Spark already inferred.
  *
  * Determinism contract: callers must make `order` a total order (e.g. add
  * a unique tiebreak column); the kept set is then exactly the first k
  * under that order, independent of partitioning.
  *
  * Capacity contract: the per-partition heap map is an unmanaged JVM
  * structure — no `TaskMemoryManager` accounting, no spill — holding up to
  * k·|groups seen in the partition| row copies. It is the right operator
  * when k·|groups| per partition fits comfortably in executor memory
  * (ranks over brands/nations/categories at any fact-table size). For
  * HIGH-CARDINALITY group keys (per-user, per-document) prefer the window
  * formulation (Relational.w2), whose external sort spills; this operator
  * would hold the whole group-key domain on the reduce side. The two plans
  * are result-identical (asserted in TopKSpec), so the choice is purely a
  * memory-shape decision.
  *
  * Codegen boundary: both exec nodes are iterator-based (`doExecute`), so
  * they sit OUTSIDE whole-stage codegen — the scan/join below and anything
  * above still fuse among themselves; the boundary costs one row-copy per
  * retained row (k·|groups| rows, not the fact table), which the bounded
  * exchange repays many times over at scale (see PLANS.md x1).
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Planner rule: custom logical node → partial + final physical pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKFinalExec(g, o, k, TopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition bounded-heap pass: keeps the first k rows per group
  * under `order` within one partition. */
private[plans] trait TopKExecBase extends UnaryExecNode {
  def groupExprs: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected def prunePartitions(rdd: RDD[InternalRow]): RDD[InternalRow] = {
    val (g, o, kk, attrs) = (groupExprs, order, k, child.output)
    rdd.mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(g, attrs)
      // head of the queue = row that sorts LAST under `order` = the current
      // worst of the kept k (PriorityQueue is a max-heap in its Ordering)
      val ord = RowOrdering.create(o, attrs)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }
}

/** Map-side prune: runs on the child's partitioning (no exchange below). */
case class TopKPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends TopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = prunePartitions(child.execute())
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side merge: declares clustering on the group keys so
  * EnsureRequirements inserts ONE hash exchange over the pruned rows. */
case class TopKFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends TopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = prunePartitions(child.execute())
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}

/** Name-based front door: `TopKPerGroup(df, groupBy, orderBy, k)`. Orders
  * are (column, descending?) pairs. Unresolved attributes are built here
  * and resolved by the analyzer against the child — constructing the
  * catalyst tree ourselves keeps it free of Column-node conversion tags
  * (which embed non-serializable `sql.internal` nodes). */
object TopKPerGroup {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** Registers the strategy once per session (idempotent). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  def apply(df: DataFrame, groupBy: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = TopKPerGroupPlan(
      groupBy.map(UnresolvedAttribute(_)),
      orderBy.map { case (name, desc) =>
        SortOrder(UnresolvedAttribute(name), if (desc) Descending else Ascending)
      },
      k,
      df.queryExecution.analyzed)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, plan)
  }
}

/** Optimizer rule: auto-route the stock window-top-k idiom
  * (`row_number().over(partitionBy g orderBy o) <= k`, rank projected
  * away afterwards) into [[TopKPerGroupPlan]] — users keep writing the
  * declarative window formulation and the planner swaps in the
  * bounded-exchange operator. OPT-IN via
  * `spark.graft.rewriteRankFilter=true` because the rewrite trades the
  * window's spill-safe external sort for the unmanaged per-partition
  * heap map (see the capacity contract above): correct only where
  * k·|groups| per partition fits in memory, which the USER must assert —
  * exactly like choosing the facade directly. Matches only the exact
  * 3-node shape Catalyst leaves after optimization (Project that drops
  * the rank attr → Filter(rank ≤ int literal) → single-row_number
  * Window), so partial matches fall through untouched. */
object RewriteRankFilterToTopK
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rewriteRankFilter", "false") == "true"

  /** Registers the rule + strategy once per session (idempotent). */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    TopKPerGroup.ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case Project(pl, Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
            parts, orders, child, _)))
          if rankBound(cond, al.exprId).exists(_ > 0) &&
            pl.forall(_.references.subsetOf(child.outputSet)) &&
            orders.nonEmpty =>
        // Spark's own InferWindowGroupLimit may already have inserted a
        // sort-based rank-limit prune below the Window — unwrap it, or the
        // plan pays BOTH prunes (and the WindowGroupLimit's extra sorts)
        val base = child match {
          case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
          case other => other
        }
        Project(pl, TopKPerGroupPlan(parts, orders,
          rankBound(cond, al.exprId).get, base))
    }

  /** k such that cond ⟺ rank ≤ k, if cond is that shape. */
  private def rankBound(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rankId: org.apache.spark.sql.catalyst.expressions.ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rankId => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rankId => Some(k - 1)
      case _ => None
    }
}
