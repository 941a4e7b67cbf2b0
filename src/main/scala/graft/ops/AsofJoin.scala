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
    *                   right timestamp.
    *
    * The right row travels as ONE struct carried by a single
    * `last(ignoreNulls)`: carrying each value column separately would let
    * a NULL in the matched row fall through to an older row's value —
    * the matched row's fields must surface verbatim, NULLs included. */
  def asofBackward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      valueCols: Seq[String], asofTsCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)
    def rowStruct(ts: Column, vals: Seq[Column]): Column =
      struct(ts.alias("_ts") +: vals.zip(valueCols).map {
        case (v, c) => v.alias(s"_v_$c") }: _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_ts", right.schema(rightTs).dataType) +:
        valueCols.map(c =>
          org.apache.spark.sql.types.StructField(s"_v_$c", right.schema(c).dataType)))
    val lSel = left.select(
      leftCols.map(col) ++ Seq(
        col(leftKey).alias("_k"), col(leftTs).alias("_t"),
        lit(1).alias("_tag"),
        lit(null).cast(rStructType).alias("_r")): _*)
    // ASOF equality never matches NULL = NULL and a NULL right ts can't
    // satisfy `r.ts <= l.ts` — drop such right rows BEFORE the union, or
    // the NULL-key window partition would attach them to NULL-key left
    // rows (which must come out unmatched, as DuckDB's ASOF leaves them)
    val rSel = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        leftCols.map(c => nullOf(left, c).alias(c)) ++ Seq(
          col(rightKey).alias("_k"), col(rightTs).alias("_t"),
          lit(0).alias("_tag"),
          rowStruct(col(rightTs), valueCols.map(col)).alias("_r")): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rSel)
      .select(leftCols.map(col) ++ Seq(col("_tag"),
        last(col("_r"), ignoreNulls = true).over(w).alias("_r")): _*)
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        Seq(col("_r._ts").alias(asofTsCol)) ++
        valueCols.map(c => col(s"_r._v_$c").alias(c)): _*)
  }
}
