package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class ConfusionCounts(tp: Long, fp: Long, tn: Long, fn: Long)

case class BinaryMetrics(tp: Long, fp: Long, tn: Long, fn: Long,
  accuracy: Option[Double], precision: Option[Double],
  recall: Option[Double], f1: Option[Double])

/** Typed confusion-matrix aggregator (SURVEY §7.2 "optional sugar"):
  * `Aggregator[(prediction, label), ConfusionCounts, BinaryMetrics]` — the
  * typed-Dataset counterpart of the conditional-agg metric queries (A4/A6).
  * Merge is associative/commutative, so Spark runs it partial+final like
  * any hash aggregate; metrics use the same integer-derived formulas
  * (F1 = 2·tp/(2·tp+fp+fn)) and HALF_UP 6-decimal rounding as the SQL path,
  * so results are bit-identical to the DuckDB oracle. */
class ConfusionMetricsAggregator extends Aggregator[(Double, Double), ConfusionCounts, BinaryMetrics] {

  override def zero: ConfusionCounts = ConfusionCounts(0L, 0L, 0L, 0L)

  override def reduce(b: ConfusionCounts, a: (Double, Double)): ConfusionCounts = {
    val (pred, label) = a
    ConfusionCounts(
      b.tp + (if (pred == 1.0 && label == 1.0) 1L else 0L),
      b.fp + (if (pred == 1.0 && label == 0.0) 1L else 0L),
      b.tn + (if (pred == 0.0 && label == 0.0) 1L else 0L),
      b.fn + (if (pred == 0.0 && label == 1.0) 1L else 0L))
  }

  override def merge(x: ConfusionCounts, y: ConfusionCounts): ConfusionCounts =
    ConfusionCounts(x.tp + y.tp, x.fp + y.fp, x.tn + y.tn, x.fn + y.fn)

  override def finish(c: ConfusionCounts): BinaryMetrics = {
    def ratio(num: Double, den: Long): Option[Double] =
      if (den == 0L) None else Some(r6(num / den))
    BinaryMetrics(c.tp, c.fp, c.tn, c.fn,
      ratio((c.tp + c.tn).toDouble, c.tp + c.fp + c.tn + c.fn),
      ratio(c.tp.toDouble, c.tp + c.fp),
      ratio(c.tp.toDouble, c.tp + c.fn),
      ratio(2.0 * c.tp, 2 * c.tp + c.fp + c.fn))
  }

  /** HALF_UP to 6 decimals — same as Spark/DuckDB `round(x, 6)`. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def bufferEncoder: Encoder[ConfusionCounts] = Encoders.product[ConfusionCounts]
  override def outputEncoder: Encoder[BinaryMetrics] = Encoders.product[BinaryMetrics]
}
