package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WordPiece greedy longest-match-first
  * encoding (Wu et al. 2016, 1609.08144 §4.1 — the BERT tokenizer's
  * algorithm) of a word against the fixed vocabulary in
  * [[WordPieceEncode.Vocab]]. Unlike tok3's Viterbi (global min-cost)
  * this is the GREEDY rule actually shipped in BERT-family tokenizers:
  * at each position take the LONGEST vocabulary piece that matches
  * (continuation positions require the `##` form), and if no piece
  * matches at some position the WHOLE word becomes a single [UNK] —
  * the all-or-nothing contract that makes WordPiece's UNK rate a real
  * vocabulary-coverage metric.
  *
  * Returns `pieceCount·2 + (isUnk ? 1 : 0)` packed in one long (an UNK
  * word counts as 1 piece). Greedy + longest-first means the result is
  * a pure function of the word with no tie to break, so the DuckDB
  * oracle can replay the scan as a fixed per-position CTE unroll (the
  * tok3/bpe2 precedent) over the same vocabulary VALUES.
  *
  * Native rather than a UDF for the same reason as [[ViterbiCost]]:
  * one fused per-row pass via a static call that stays inside
  * whole-stage codegen.
  */
case class WordPieceEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wordpiece"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceEncode.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceEncode.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceEncode {
  /** Max piece length (excluding the ## marker) — bounds the scan. */
  val MaxPiece = 6

  /** The fixed WordPiece vocabulary. Root pieces match at position 0;
    * `##` continuation pieces match elsewhere. Single-char coverage is
    * DELIBERATELY partial (no q/x/z roots, no ##0-##9) so the fixture
    * genuinely exercises the [UNK] path. Shared VERBATIM with the
    * DuckDB oracle via [[vocabSql]]. */
  val Vocab: Seq[String] = {
    val rootChars = (('a' to 'p') ++ ('r' to 'w') ++ Seq('y')).map(_.toString)
    val contChars = (('a' to 'z')).map(c => "##" + c)
    val roots = Seq("ta", "qu", "st", "wi", "val", "que", "tab", "spark",
      "batch", "stream", "window", "filter", "column", "table", "value",
      "query")
    val conts = Seq("##er", "##le", "##ue", "##ry", "##ble", "##ndow",
      "##lter", "##lumn", "##ream", "##atch", "##alue", "##uery", "##able")
    rootChars ++ contChars ++ roots ++ conts
  }

  /** `('piece'), …` rows for the oracle's `v(piece)` CTE. */
  def vocabSql: String = Vocab.map(p => s"('$p')").mkString(", ")

  private val lookup: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Vocab.foreach(s.add)
    s
  }

  /** Vocabulary membership — shared with [[WordPieceSegments]] so both
    * expressions scan the SAME set. */
  def contains(piece: String): Boolean = lookup.contains(piece)

  /** Static entry point shared by interpreted eval and codegen:
    * greedy longest-match piece count, packed as count·2 + isUnk. */
  def compute(s: UTF8String): Long = {
    val w = s.toString
    val n = w.length
    if (n == 0) return 0L
    var pos = 0
    var cnt = 0L
    while (pos < n) {
      var take = -1
      var l = math.min(MaxPiece, n - pos)
      while (l >= 1 && take < 0) {
        val cand =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        if (lookup.contains(cand)) take = l
        l -= 1
      }
      if (take < 0) return 1L * 2 + 1 // whole word -> [UNK]
      cnt += 1
      pos += take
    }
    cnt * 2
  }
}
