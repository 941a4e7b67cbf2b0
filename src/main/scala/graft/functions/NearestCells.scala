package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** `k` nearest centroid ids of a vector by squared L2, ascending
  * (distance, cell) — ties break to the LOWER cell id, exactly the
  * ordering `array_min(transform(centroids, struct(dist, cell)))` yields.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): cell
  * assignment is `rows × cells × dim` work, and the HOF formulation
  * (`transform` + `aggregate`/`zip_with` per centroid) is evaluated
  * INTERPRETED with per-element boxing — the r8 scale probe measured it as
  * the dominant super-linear term of SemDeDup once cells grow with the
  * corpus (n/125 cells at 10× data ⇒ 100× boxed ops). This compiles to a
  * tight primitive double loop with an insertion top-k inside whole-stage
  * codegen.
  *
  * The centroid matrix rides the expression as a constant reference object
  * (serialized once per task binary, bound via `addReferenceObj` in
  * codegen) — right up to ~10⁴ cells × dim doubles. Beyond that (10⁵⁺
  * cells at fleet scale) switch to a coarse→fine two-level assignment: two
  * chained NearestCells calls of √cells each keep the constant small and
  * the work `rows × 2√cells × dim`.
  *
  * NULL contract: a NULL vector, a NULL element, or a vector whose length
  * differs from the centroid dim returns NULL (loud, like [[FloatVecDot]])
  * rather than assigning a plausible-looking wrong cell.
  */
case class NearestCellsL2(child: Expression, centers: Array[Array[Double]],
    k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float> or array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  private val dim: Int = if (centers.isEmpty) 0 else centers(0).length
  private val kEff: Int = math.min(k, centers.length)

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) return null
    val bd = new Array[Double](kEff)
    val bc = new Array[Int](kEff)
    var filled = 0
    var c = 0
    while (c < centers.length) {
      val cen = centers(c)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        if (elementsNullable && vec.isNullAt(j)) return null
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val d = x - cen(j)
        acc += d * d
        j += 1
      }
      var pos = filled
      while (pos > 0 && acc < bd(pos - 1)) pos -= 1
      if (pos < kEff) {
        val end = if (filled < kEff) filled else kEff - 1
        var m = end
        while (m > pos) { bd(m) = bd(m - 1); bc(m) = bc(m - 1); m -= 1 }
        bd(pos) = acc
        bc(pos) = c
        if (filled < kEff) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == kEff) bc else java.util.Arrays.copyOf(bc, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("centers", centers, "double[][]")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val cen = ctx.freshName("cen")
      val out = ctx.freshName("out")
      val getter = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      val nullCheck = if (elementsNullable)
        s"if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }" else ""
      // labeled outer loop so a NULL element aborts the whole assignment
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $bd = new double[$kEff];
         |  int[] $bc = new int[$kEff];
         |  int $filled = 0;
         |  outer:
         |  for (int $c = 0; $c < $cRef.length; $c++) {
         |    double[] $cen = $cRef[$c];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $nullCheck
         |      double $d = $getter - $cen[$j];
         |      $acc += $d * $d;
         |    }
         |    if (${ev.isNull}) break outer;
         |    int $pos = $filled;
         |    while ($pos > 0 && $acc < $bd[$pos - 1]) $pos--;
         |    if ($pos < $kEff) {
         |      int $m = ($filled < $kEff) ? $filled : $kEff - 1;
         |      for (; $m > $pos; $m--) { $bd[$m] = $bd[$m - 1]; $bc[$m] = $bc[$m - 1]; }
         |      $bd[$pos] = $acc;
         |      $bc[$pos] = $c;
         |      if ($filled < $kEff) $filled++;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $out = ($filled == $kEff) ? $bc : java.util.Arrays.copyOf($bc, $filled);
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellsL2 =
    copy(child = newChild)
}
