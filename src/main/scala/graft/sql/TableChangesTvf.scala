package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.lit

import graft.ops.TxLog

/** `SELECT … FROM table_changes('<path>', '<k1[,k2…]>', start [, end])`
  * — Delta's CDF table-valued function re-expressed over the txlog
  * change feed. Versions in [start, end] (end defaults to latest) each
  * contribute their keyed diff (insert / update post-image / delete
  * pre-image — [[TxLog.commitChanges]]), stamped `_change_type`,
  * `_commit_version`, `_commit_timestamp`. Key columns are an explicit
  * argument because the txlog CDF is a KEYED diff (row identity by
  * business key), where Delta's is file-level — the keyed form is what
  * incremental consumers join on anyway.
  *
  * Arguments must be literals: the plan is built at analysis time, so
  * the version bounds resolve against the log once — like Delta's own
  * `table_changes` argument resolution. Work stays deferred: each
  * version's diff is a lazy plan over exactly the files that commit
  * touched, so a micro-range read of a huge table stays commit-sized. */
object TableChangesTvf {
  def plan(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 3 || es.length == 4,
      "table_changes expects (table, keyCols, startVersion[, endVersion])")
    def arg(i: Int): Any = {
      require(es(i).foldable,
        s"table_changes: argument ${i + 1} must be a literal")
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def asLong(i: Int): Long = arg(i) match {
      case n: java.lang.Number => n.longValue()
      case other => other.toString.toLong
    }
    val spark = SparkSession.active
    val table = String.valueOf(arg(0))
    val keys = String.valueOf(arg(1)).split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(keys.nonEmpty,
      "table_changes: keyCols must name at least one column")
    val latest = TxLog.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"table_changes: txlog table $table has no commits"))
    val from = asLong(2)
    val to = if (es.length == 4) asLong(3) else latest
    require(from >= 1 && from <= to && to <= latest,
      s"table_changes: version range [$from, $to] must lie in [1, $latest]")
    val tsByV = TxLog.commits(table).map(c => c.version -> c.ts).toMap
    val perV = (from to to).map { v =>
      TxLog.commitChanges(spark, table, v, keys)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          (lit(tsByV.getOrElse(v, -1L)) / lit(1000.0)).cast("timestamp"))
    }
    perV.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
      .withColumnRenamed("change_type", "_change_type")
      .queryExecution.analyzed
  }
}
