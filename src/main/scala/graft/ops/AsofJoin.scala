package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right row
  * with `right.ts <= left.ts` in the same key group — the time-series
  * lookup Spark has no native operator for (DuckDB spells it `ASOF JOIN`,
  * which is what the oracle uses).
  *
  * Implementation is the union-merge pattern, not a range join: tag both
  * sides, hash-partition on the key, sort each partition by (ts, tag) and
  * carry the right side's values forward with `last(..., ignoreNulls)`
  * over an unbounded-preceding frame. Cost is ONE shuffle of |L|+|R| rows
  * plus an in-partition sort — no |L|×|candidate-window| intermediate the
  * naive `l JOIN r ON key AND r.ts <= l.ts` + max-per-group plan explodes
  * into, which is the difference between linear and quadratic on dense
  * keys at 100 TB.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate otherwise —
  * so tie-handling is deterministic: a right row AT the left timestamp
  * wins (tag orders right before left), matching ASOF's `>=` bound.
  */
object AsofJoin {

  /** @param valueCols right-side columns carried onto each left row
    *                   (NULL where no right row precedes the left row);
    *                   emitted as-named, plus `asofTsCol` = the matched
    *                   right timestamp. */
  def asofBackward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      valueCols: Seq[String], asofTsCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)
    val lSel = left.select(
      leftCols.map(col) ++ Seq(
        col(leftKey).alias("_k"), col(leftTs).alias("_t"),
        lit(1).alias("_tag"), nullOf(right, rightTs).alias("_vt")) ++
        valueCols.map(c => nullOf(right, c).alias(s"_v_$c")): _*)
    val rSel = right.select(
      leftCols.map(c => nullOf(left, c).alias(c)) ++ Seq(
        col(rightKey).alias("_k"), col(rightTs).alias("_t"),
        lit(0).alias("_tag"), col(rightTs).alias("_vt")) ++
        valueCols.map(c => col(c).alias(s"_v_$c")): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("_vt" +: valueCols.map("_v_" + _)).map(c =>
      last(col(c), ignoreNulls = true).over(w).alias(c))
    lSel.unionByName(rSel)
      .select(leftCols.map(col) ++ Seq(col("_tag")) ++ carried: _*)
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ Seq(col("_vt").alias(asofTsCol)) ++
        valueCols.map(c => col(s"_v_$c").alias(c)): _*)
  }
}
