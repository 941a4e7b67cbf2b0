package graft.sources.txlog

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.TxLog

/** TxLog tables as a first-class Spark data source:
  *
  * {{{
  *   spark.read.format("graft.sources.txlog")
  *     .option("path", "/lake/events")
  *     .option("versionAsOf", "3")          // or timestampAsOf (millis)
  *     .load()
  * }}}
  *
  * The relation resolves the snapshot THROUGH the log (active file list +
  * log-carried schema — no directory listing, no footer inference) and
  * delegates the actual columnar scan to Spark's parquet reader over
  * exactly the snapshot's files, so pushdown/pruning/codegen behave as a
  * native parquet scan of those files. [[PrunedFilteredScan]] forwards
  * the pruned columns and pushable filters into that delegate, keeping
  * the plan scan-shaped rather than scan-then-filter-everything.
  *
  * Version resolution mirrors [[TxLog.read]] / [[TxLog.readAsOfTimestamp]];
  * passing both options is an error. This registration makes the table
  * tier consumable from `spark.read` API call sites (and SQL via
  * `CREATE TABLE … USING graft.sources.txlog OPTIONS (path …)`) without
  * importing TxLog.
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider {

  /** Write path: `df.write.format("graft.sources.txlog").mode(…).save(path)`
    * (and SQL `INSERT INTO/OVERWRITE` on a `USING graft.sources.txlog`
    * table). Append → [[TxLog.append]], Overwrite → [[TxLog.overwrite]] —
    * each ONE atomic commit with the usual schema enforcement and CHECK
    * constraints; ErrorIfExists/Ignore follow their SaveMode contracts
    * against the table's existence in the LOG (a directory with no commits
    * is not a table). Options: `statsCols` (comma-separated) records
    * per-file min/max for data skipping; `mergeSchema` allows evolution. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("txlog sink requires option 'path'"))
    val statsCols = parameters.get("statscols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val mergeSchema = parameters.get("mergeschema").exists(_.toBoolean)
    val exists = TxLog.latestVersion(path).isDefined
    mode match {
      case SaveMode.Append =>
        TxLog.append(data, path, statsCols, mergeSchema)
      case SaveMode.Overwrite =>
        TxLog.overwrite(data, path, statsCols, mergeSchema)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"txlog table $path already exists (SaveMode.ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        TxLog.overwrite(data, path, statsCols, mergeSchema)
      case SaveMode.Ignore =>
        if (!exists) TxLog.overwrite(data, path, statsCols, mergeSchema)
    }
    TxLogRelation(sqlContext, path, None)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("txlog source requires option 'path'"))
    val version = parameters.get("versionasof").map(_.toLong)
    val tsMillis = parameters.get("timestampasof").map(_.toLong)
    require(version.isEmpty || tsMillis.isEmpty,
      "txlog source: pass versionAsOf OR timestampAsOf, not both")
    val asOf = (version, tsMillis) match {
      case (Some(v), _) => Some(v)
      case (_, Some(ts)) =>
        Some(TxLog.commits(path).filter(_.ts <= ts).lastOption
          .getOrElse(throw new IllegalArgumentException(
            s"txlog table $path has no commit at or before ts $ts")).version)
      case _ => None
    }
    TxLogRelation(sqlContext, path, asOf)
  }
}

case class TxLogRelation(sqlContext: SQLContext, path: String,
    asOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  /** Snapshot isolation: the version is resolved ONCE, at relation
    * creation. Without this, an asOf=None relation re-folds the active
    * file list at every buildScan, so a commit landing between planning
    * (schema fixed here) and execution would scan a different — possibly
    * schema-incompatible — version than was planned. */
  private val pinnedVersion: Option[Long] =
    asOf.orElse(TxLog.latestVersion(path))

  private def snapshot =
    TxLog.read(sqlContext.sparkSession, path, pinnedVersion)

  override val schema: StructType = snapshot.schema

  /** Delegate to the parquet reader over the snapshot's files with the
    * pruning/filtering re-applied — Catalyst re-plans the delegate with
    * the same pushdown it proved for a direct parquet scan. `filters`
    * here are advisory (Spark re-evaluates residuals above this scan). */
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pruned =
      if (requiredColumns.isEmpty) snapshot
      else snapshot.select(requiredColumns.head, requiredColumns.tail: _*)
    filters.foldLeft(pruned) { (df, f) =>
      filterToColumn(f).map(df.filter).getOrElse(df)
    }.rdd
  }

  private def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case _ => None // residual filters are applied by Spark above the scan
    }
  }
}
