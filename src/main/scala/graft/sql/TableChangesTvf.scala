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
    val spark = SparkSession.active
    val table = String.valueOf(arg(0))
    val keys = String.valueOf(arg(1)).split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(keys.nonEmpty,
      "table_changes: keyCols must name at least one column")
    val latest = TxLog.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"table_changes: txlog table $table has no commits"))
    // Delta's dual argument form: a bound is a VERSION (integer literal
    // or all-digits string) or a TIMESTAMP (TIMESTAMP '…' literal or a
    // 'yyyy-MM-dd HH:mm:ss' string). Timestamps resolve against the
    // strictly monotone in-commit stamps: the start takes the first
    // commit at or after it, the end the last commit at or before —
    // both refuse when no commit qualifies, like Delta.
    def asBound(i: Int, isStart: Boolean): Long = {
      val millis: Option[Long] = es(i).dataType match {
        case _: org.apache.spark.sql.types.TimestampType =>
          Some(arg(i).asInstanceOf[Long] / 1000L)
        case _ =>
          val s = String.valueOf(arg(i)).trim
          if (s.forall(_.isDigit)) None
          else Some(scala.util.Try(java.sql.Timestamp.valueOf(s).getTime)
            .getOrElse(throw new IllegalArgumentException(
              s"table_changes: argument ${i + 1} is neither a version " +
                s"nor a 'yyyy-MM-dd HH:mm:ss' timestamp: '$s'")))
      }
      millis match {
        case None => String.valueOf(arg(i)).trim.toLong
        case Some(ms) if isStart =>
          // a start timestamp at or before the retention-horizon stamp
          // would resolve to the first SURVIVING commit and silently
          // skip the expired changes — refuse with the remedy instead
          TxLog.retentionHorizonTs(table).foreach { hts =>
            if (ms <= hts) throw new IllegalArgumentException(
              s"table_changes: start timestamp $ms reaches into the " +
                s"expired log range of $table (log-retention horizon " +
                s"stamp $hts) — expireLog deleted those commits. Start " +
                "after the horizon, or bootstrap a fresh consumer from " +
                "the current snapshot")
          }
          TxLog.commits(table).find(_.ts >= ms).map(_.version)
            .getOrElse(throw new IllegalArgumentException(
              s"table_changes: no commit at or after start timestamp " +
                s"$ms on $table — the table's last commit predates it"))
        case Some(ms) =>
          TxLog.commits(table).filter(_.ts <= ms).lastOption.map(_.version)
            .getOrElse(throw new IllegalArgumentException(
              s"table_changes: no commit at or before end timestamp " +
                s"$ms on $table — the table's first commit postdates it"))
      }
    }
    def asLong(i: Int): Long = es(i).dataType match {
      case _: org.apache.spark.sql.types.TimestampType =>
        asBound(i, isStart = i == 2)
      case _ => arg(i) match {
        case n: java.lang.Number => n.longValue()
        case _ => asBound(i, isStart = i == 2)
      }
    }
    val from = asLong(2)
    val to = if (es.length == 4) asLong(3) else latest
    require(from >= 1 && from <= to && to <= latest,
      s"table_changes: version range [$from, $to] must lie in [1, $latest]")
    // each version in the range contributes its commit's diff — versions
    // at or below the retention horizon have no commit file left, so the
    // range must refuse loudly, never feed a partial window
    TxLog.retentionHorizon(table).foreach { h =>
      require(from > h,
        s"table_changes: start version $from is at or below the " +
          s"log-retention horizon $h of $table — expireLog deleted those " +
          "commits. Start above the horizon, or bootstrap a fresh " +
          "consumer from the current snapshot")
    }
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
