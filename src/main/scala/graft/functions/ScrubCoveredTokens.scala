package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokens NOT covered by any fixed-width duplicated span, in one merge
  * walk — O(tokens + starts), zero per-token searching.
  *
  * `scrub_covered_tokens(tokens, starts, k)`: token `i` is covered iff
  * some duplicated k-token window starts in `(i-k, i]`; `starts` is the
  * ASCENDING array of duplicated window start positions (produce with
  * `sort_array(collect_list(pos))`). Because both sides are ordered, a
  * single cursor over `starts` tracks the latest start ≤ i — the
  * coverage test is one comparison per token.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): the
  * HOF form `filter(toks, (t,i) -> !exists(starts, s -> ...))` rescans
  * the starts array per token — O(tokens × starts) on a heavily
  * duplicated document (VERDICT r14 "what's wrong" item 3). The walk
  * here is linear and codegen'd, so the scrub stays scan-shaped however
  * pathological the duplication.
  *
  * Contract: `starts` ascending (dup starts from one doc are distinct by
  * construction); NULL array input → NULL result; NULL token elements
  * pass through untouched (position semantics must not shift).
  */
case class ScrubCoveredTokens(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "scrub_covered_tokens requires (array<string>, array<int>, int), " +
          s"got ($a, $b, $c)")
    }
  override def dataType: DataType = first.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "scrub_covered_tokens"

  override def nullSafeEval(toks: Any, starts: Any, kv: Any): Any = {
    val a = toks.asInstanceOf[ArrayData]
    val b = starts.asInstanceOf[ArrayData]
    val k = kv.asInstanceOf[Int]
    val n = a.numElements()
    val m = b.numElements()
    val tmp = new Array[AnyRef](n)
    var cnt = 0
    var j = 0
    var last = Long.MinValue
    var i = 0
    while (i < n) {
      while (j < m && b.getInt(j) <= i) { last = b.getInt(j).toLong; j += 1 }
      if (last <= i.toLong - k) {
        tmp(cnt) = if (a.isNullAt(i)) null else a.getUTF8String(i)
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val last = ctx.freshName("last")
      val tmp = ctx.freshName("tmp")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |Object[] $tmp = new Object[$n];
         |int $cnt = 0, $j = 0;
         |long $last = Long.MIN_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  while ($j < $m && $b.getInt($j) <= $i) {
         |    $last = (long) $b.getInt($j); $j++;
         |  }
         |  if ($last <= (long) $i - (long) $c) {
         |    $tmp[$cnt++] = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  }
         |}
         |${ev.value} = new $gad(java.util.Arrays.copyOf($tmp, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ScrubCoveredTokens =
    copy(first = newFirst, second = newSecond, third = newThird)
}
