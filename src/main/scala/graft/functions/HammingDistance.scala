package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: byte-wise Hamming distance between two
  * strings (positions differing, plus the length difference). Codegen'd —
  * a single fused loop replaces the 32-term substring-compare expression
  * the SimHash pair filter otherwise needs (SURVEY §7.2: custom
  * `Expression` beats UDF; used by graft.ops.Dedup.d5).
  *
  * For the ASCII bit-signatures it serves, byte comparison equals
  * character comparison.
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val len = math.min(a.length, b.length)
    var i = 0
    var n = 0L
    while (i < len) {
      if (a(i) != b(i)) n += 1L
      i += 1
    }
    n + math.abs(a.length - b.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |int $len = Math.min($ab.length, $bb.length);
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($ab[$i] != $bb[$i]) ${ev.value}_acc++;
         |}
         |${ev.value} = ${ev.value}_acc + Math.abs($ab.length - $bb.length);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
