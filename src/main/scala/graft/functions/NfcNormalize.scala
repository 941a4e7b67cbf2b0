package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every multilingual corpus needs before
  * hashing, dedup, or tokenization: "é" as U+00E9 and as "e"+U+0301 are
  * the same text but different bytes, so un-normalized corpora
  * under-deduplicate and split token statistics. Wraps the JDK's
  * `java.text.Normalizer` (stable across platforms for a given Unicode
  * version) rather than a UDF, so it stays inside whole-stage codegen
  * like the other graft natives. DuckDB's `nfc_normalize` is the oracle
  * twin. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: already-NFC text (the overwhelming majority) skips the
    // composition pass entirely
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("nfcStr")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
