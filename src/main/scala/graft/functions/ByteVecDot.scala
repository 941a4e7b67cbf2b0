package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Codegen'd dot product over two `array<tinyint>` columns — the scoring
  * kernel of scalar-quantized (SQ8) similarity search
  * ([[graft.ext.Similarity.sq8TopK]]).
  *
  * Returns LONG, and the arithmetic is EXACT: |products| ≤ 127², so any
  * realistic dimensionality stays far inside 64-bit range — which is what
  * makes the quantized stage oracle-able (integer sums are
  * order-independent, unlike float folds). Same null contract as
  * [[FloatVecDot]]: mismatched lengths or null elements → NULL, because a
  * dimension mismatch is an upstream bug, not a scoring decision.
  *
  * Why this exists at 100 TB: an int8 vector is 4× smaller than f32 —
  * 4× more vectors per cache line, per shuffle block, per broadcast — and
  * the shortlist-then-rerank pattern does the bulk of its comparisons on
  * the quantized form.
  */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_i8 requires (array<tinyint>, array<tinyint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_i8"

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elementsNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteVecDot =
    copy(left = newLeft, right = newRight)
}
