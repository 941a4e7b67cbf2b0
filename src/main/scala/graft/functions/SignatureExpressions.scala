package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared 64-bit mixer (splitmix64 finalizer) used by the native signature
  * expressions — one multiply-xor chain per (element, seed) pair instead of
  * a Catalyst expression-tree walk. Deterministic and platform-independent.
  */
object Mix64 {
  @inline final def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  // Java source for codegen (kept in lockstep with mix() above)
  val javaSrc: String =
    """
      |private static long graftMix64(long z) {
      |  z += 0x9E3779B97F4A7C15L;
      |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
      |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
      |  return z ^ (z >>> 31);
      |}
    """.stripMargin
}

/** MinHash signature over a pre-hashed shingle array: for each of
  * `numHashes` seeds, the minimum of splitmix64(h ^ seedMix(i)) over the
  * array — all seeds computed in ONE pass over the array in generated code
  * (the composed-HOF formulation walks the array once per seed with boxed
  * lambda variables).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var s = 0
      while (s < numHashes) {
        val v = Mix64.mix(h ^ (s * 0xC2B2AE3D27D4EB4FL))
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    ctx.addNewFunction("graftMix64", Mix64.javaSrc.trim)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    long $v = graftMix64($h ^ ($s * 0xC2B2AE3D27D4EB4FL));
         |    if ($v < $out[$s]) $out[$s] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Order-sensitive n-gram shingle hashes from a token-hash array: shingle i
  * is the iterated-mix fold of token hashes i..i+n-1. Replaces
  * concat-words-then-hash-string shingling (same discriminative power, zero
  * string allocation — the dominant cost of MinHash pipelines).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = math.max(len - n + 1, if (len == 0) 0 else 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var c = 0L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        c = Mix64.mix(c ^ arr.getLong(j))
        j += 1
      }
      out(i) = c
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    ctx.addNewFunction("graftMix64", Mix64.javaSrc.trim)
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val end = ctx.freshName("end")
      s"""
         |int $len = $a.numElements();
         |int $m = java.lang.Math.max($len - $n + 1, $len == 0 ? 0 : 1);
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $c = 0L;
         |  int $end = java.lang.Math.min($i + $n, $len);
         |  for (int $j = $i; $j < $end; $j++) {
         |    $c = graftMix64($c ^ $a.getLong($j));
         |  }
         |  $out[$i] = $c;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** 64-bit SimHash over a pre-hashed token array: per-bit ±1 votes from each
  * token hash (re-mixed so bit i is independent of the band structure of
  * the input hash), sign-folded to a long — single generated loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Mix64.mix(arr.getLong(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    ctx.addNewFunction("graftMix64", Mix64.javaSrc.trim)
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graftMix64($a.getLong($i));
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
