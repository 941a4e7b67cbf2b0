package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.ops.TxLog

/** `SELECT … FROM table_files('<path>' [, version])` — the active-file
  * inventory of a txlog snapshot as a queryable metadata table (Delta
  * surfaces the same through its `files` metadata / `DESCRIBE DETAIL`
  * aggregates; Iceberg as the `files` metadata table). One row per
  * active data file:
  *
  *   - `file`: path relative to the table root
  *   - `partition`: `k=v[/k2=v2…]` or `<unpartitioned>` (logical column
  *     names under column mapping)
  *   - `size_bytes` / `rows`: commit-recorded size and parquet-footer
  *     row count (NULL when the adding commit predates recording —
  *     unknown, never zero)
  *   - `added_version`: the commit that added the file (its age — what
  *     an operator reads to see how compaction/retention shaped a table)
  *   - `has_dv`: an active deletion vector hides rows of this file (so
  *     `rows` is an upper bound for it)
  *
  * Everything answers from the metadata plane: one cached log fold plus
  * the active DV sidecars — no data file is opened, O(active files)
  * rows, which is what makes the inventory queryable on a 100 TB table
  * (the data may be 100 TB; this table is the file COUNT). Arguments
  * must be literals (plan built at analysis time, like table_changes). */
object TableFilesTvf {
  def plan(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 1 || es.length == 2,
      "table_files expects (table [, version])")
    def arg(i: Int): Any = {
      require(es(i).foldable,
        s"table_files: argument ${i + 1} must be a literal")
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    val spark = SparkSession.active
    val table = String.valueOf(arg(0))
    val asOf: Option[Long] =
      if (es.length == 2) Some(arg(1) match {
        case n: java.lang.Number => n.longValue()
        case other => String.valueOf(other).trim.toLong
      }) else None
    require(TxLog.latestVersion(table).nonEmpty,
      s"table_files: $table is not a txlog table")
    val rows = TxLog.tableFiles(spark, table, asOf).map {
      case (f, part, size, nRows, addedV, hasDv) =>
        Row(f, part, size.orNull, nRows.orNull, addedV, hasDv)
    }
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("size_bytes", LongType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("added_version", LongType, nullable = false),
      StructField("has_dv", BooleanType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .queryExecution.analyzed
  }
}
