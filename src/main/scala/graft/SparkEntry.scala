package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The queries map is assembled from the per-family catalogs under
  * `graft.ops` / `graft.ext`; each entry pairs a Spark build function with
  * DuckDB oracle SQL (where SQL-expressible).
  */
object SparkEntry {

  /** All catalog entries, ordered by family. */
  def catalog: Seq[QueryDef] =
    ops.CoreQueries.defs ++ ops.FunctionQueries.defs ++
      ops.WindowQueries.defs ++ ops.AnalyticsQueries.defs ++
      ops.ExtQueries.defs ++ ops.PipelineQueries.defs ++
      ops.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multiway star-join revenue aggregate — the densest single plan in
    * the catalog (scan+filter+3 joins+grouped decimal agg).
    */
  def entry(spark: SparkSession): DataFrame =
    catalog.find(_.name == "j5_join_multiway_agg").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
