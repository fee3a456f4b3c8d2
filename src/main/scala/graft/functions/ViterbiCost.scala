package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: SentencePiece-style unigram-LM Viterbi
  * segmentation cost (Kudo 2018, 1804.10959 §3) of a word against the
  * fixed integer piece vocabulary in [[ViterbiCost.Pieces]] — the
  * min-cost split of the word into vocabulary pieces, with unknown
  * single characters admitted at [[ViterbiCost.UnkCost]] so every word
  * segments.
  *
  * The DP state is ONE long per position: candidate costs are packed as
  * `cost·2¹⁶ + pieceCount`, so minimizing the packed value minimizes
  * total cost first and piece count second — the output (cost, n_pieces)
  * is a pure function of the word with NO tie-break rule to mirror (two
  * same-cost-same-count splits collide on the same packed value). This
  * is what makes the result hash-checkable against an independent
  * engine: the DuckDB oracle replays the forward DP as one chained CTE
  * per position (the bpe2 fixed-unroll precedent) over the same packed
  * integers.
  *
  * Why native rather than `aggregate(sequence(...))`: the DP fold's
  * accumulator is an array that the interpreted higher-order-function
  * machinery re-allocates per element (the d11/zo2 lesson — measured
  * there); this loop is one fused per-row pass that stays inside
  * whole-stage codegen via a static call, like [[MinGram8Hash]].
  *
  * Packing headroom: cost ≤ 300·|word| and count ≤ |word|, so a word
  * would need ~4.7e14 chars to overflow the packed long — any real
  * token is fine.
  */
case class ViterbiCost(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_viterbi"

  override protected def nullSafeEval(input: Any): Any =
    ViterbiCost.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ViterbiCost.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ViterbiCost {
  /** Max piece length — bounds the DP lookback. */
  val MaxPiece = 6
  /** Cost of an out-of-vocabulary single character. */
  val UnkCost = 300L

  /** The fixed unigram vocabulary (piece → integer cost): single
    * [a-z0-9] characters plus common sub-word and whole-word pieces,
    * costs rising sublinearly in length so multi-char pieces win when
    * they match (the unigram-LM shape: P(piece) ≫ ∏ P(chars)). Shared
    * VERBATIM with the DuckDB oracle's VALUES list via [[piecesSql]]. */
  val Pieces: Seq[(String, Long)] =
    (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> 60L) ++
      Seq("er", "an", "ta", "in", "le", "st", "ar", "re", "on", "at").map(_ -> 95L) ++
      Seq("ble", "ter", "tab", "row", "key", "val", "que", "ort").map(_ -> 130L) ++
      Seq("table", "value", "query", "spark", "batch").map(_ -> 170L) ++
      Seq("window", "stream", "filter", "column").map(_ -> 200L)

  /** `('piece', cost), …` rows for the oracle's `v(piece, cost)` CTE. */
  def piecesSql: String =
    Pieces.map { case (p, c) => s"('$p', $c)" }.mkString(", ")

  private val lookup: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    Pieces.foreach { case (p, c) => m.put(p, c) }
    m
  }

  /** Static entry point shared by interpreted eval and codegen:
    * min over segmentations of Σcost · 2¹⁶ + #pieces. */
  def compute(s: UTF8String): Long = {
    val w = s.toString
    val n = w.length
    if (n == 0) return 0L
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, 1, n + 1, Long.MaxValue)
    var j = 1
    while (j <= n) {
      val maxL = if (j < MaxPiece) j else MaxPiece
      var L = 1
      while (L <= maxL) {
        val prev = best(j - L)
        if (prev != Long.MaxValue) {
          val c = lookup.getOrDefault(w.substring(j - L, j), -1L)
          val cost = if (c >= 0L) c else if (L == 1) UnkCost else -1L
          if (cost >= 0L) {
            val cand = prev + cost * 65536L + 1L
            if (cand < best(j)) best(j) = cand
          }
        }
        L += 1
      }
      j += 1
    }
    best(n)
  }
}
