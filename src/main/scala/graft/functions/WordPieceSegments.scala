package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the PIECE SEQUENCE of
  * [[WordPieceEncode]]'s greedy longest-match WordPiece scan — the same
  * algorithm over the same shared [[WordPieceEncode.Vocab]], but
  * emitting the pieces themselves (joined by `+`, `##` continuation
  * forms preserved) instead of the packed count. An unmatchable
  * position makes the whole word `[UNK]` (the all-or-nothing contract).
  *
  * tok5 reports HOW MANY pieces a word costs; this expression exposes
  * WHICH pieces carry the corpus, enabling the vocabulary-utilization
  * audit (tok6): dead pieces, over-loaded pieces, and the single-char
  * fallback share. Greedy + longest-first means the sequence is a pure
  * function of the word, so the DuckDB oracle replays the scan with the
  * same fixed per-position CTE unroll as tok5, accumulating the piece
  * string alongside the count.
  *
  * Native for the [[ViterbiCost]] reason: one fused per-row pass via a
  * static call that stays inside whole-stage codegen.
  */
case class WordPieceSegments(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece_pieces"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceSegments.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceSegments.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSegments {
  /** Static entry point shared by interpreted eval and codegen: the
    * greedy longest-match piece sequence joined by '+', or "[UNK]". */
  def compute(s: UTF8String): UTF8String = {
    val w = s.toString
    val n = w.length
    if (n == 0) return UTF8String.fromString("")
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < n) {
      var take = -1
      var l = math.min(WordPieceEncode.MaxPiece, n - pos)
      var piece: String = null
      while (l >= 1 && take < 0) {
        val cand =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        if (WordPieceEncode.contains(cand)) { take = l; piece = cand }
        l -= 1
      }
      if (take < 0) return UTF8String.fromString("[UNK]")
      if (sb.length > 0) sb.append('+')
      sb.append(piece)
      pos += take
    }
    UTF8String.fromString(sb.toString)
  }
}
