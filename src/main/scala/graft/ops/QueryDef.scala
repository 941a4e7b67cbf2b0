package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over the testdata tables plus an
  * optional ANSI-SQL oracle (run by the driver in DuckDB over the same
  * parquet). Naming follows SURVEY.md §2 operator IDs (s*, p*, j*, a*, l*,
  * f*, w*, set*, st*, ext_*).
  *
  * Oracle-compat ground rules (learned from the driver contract):
  *   - alias every computed column identically on both sides;
  *   - never emit raw TIMESTAMP columns (format to string / cast to date);
  *   - keep double aggregation deterministic (integral sums, decimal-cast
  *     sums, or sum/count division on exact inputs) so hashes match;
  *   - result must be a deterministic SET of rows (no bare LIMIT without
  *     ORDER BY on a unique key).
  */
final case class QueryDef(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, doc: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, build, Some(oracle))

  /** Entry with no SQL-expressible oracle (driver records rows-only check). */
  def noOracle(name: String, doc: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, build, None)

  /** Staging dir for entries whose intermediate stage is materialized so
    * the DuckDB oracle recomputes the downstream stage over identical
    * inputs (the Spark side reads the same staged files back). The path
    * embeds the sf-dir name so runs at different scales can't clobber each
    * other's staged files between the dump and the DuckDB pass; the
    * literal `__SF__` in oracle SQL is substituted by [[graft.Verify]]
    * when it writes oracle_sql.json. */
  val StageRoot = "/tmp/graft_stage"
  val StageSql: String = s"$StageRoot/__SF__"
  def stageDir(dir: String): String =
    s"$StageRoot/${new java.io.File(dir).getName}"
}
