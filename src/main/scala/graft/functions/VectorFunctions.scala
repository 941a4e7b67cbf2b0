package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `Array[Float]` embedding columns, built from Spark's
  * codegen-friendly higher-order functions (no UDFs — SURVEY.md §7.3).
  *
  * Precision contract: elements are cast Float→Double BEFORE multiplying and
  * the fold runs left-to-right, so results are bit-identical to any engine
  * that promotes to f64 and accumulates sequentially (e.g. DuckDB's
  * `list_dot_product` on `DOUBLE[]`). Do not reorder the fold.
  */
object VectorFunctions {

  /** Sequential-f64 dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm inputs yield NULL explicitly (under ANSI
    * sessions 0/0 double division is NaN, and NaN sorts ABOVE every real
    * score in the descending top-k windows — a zero vector would occupy
    * the top-k slots). NULL drops out of `>=`/rank filters instead. */
  def cosine(a: Column, b: Column): Column = {
    val np = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(np === 0, lit(null)).otherwise(dot(a, b) / np)
  }

  /** Cosine via the codegen'd native [[FloatVecDot]] (bit-identical to
    * [[cosine]]; register via [[GraftFunctions.register]] first). This is
    * the hot-loop variant the similarity operators use. */
  def cosineNative(a: Column, b: Column): Column = {
    val d = GraftFunctions.vecDot _
    val np = sqrt(d(a, a)) * sqrt(d(b, b))
    when(np === 0, lit(null)).otherwise(d(a, b) / np)
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
