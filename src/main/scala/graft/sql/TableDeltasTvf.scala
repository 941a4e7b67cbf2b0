package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.ops.TxLog

/** `SELECT … FROM table_deltas('<path>', fromVersion [, toVersion])` —
  * the KEYLESS signed multiset change feed ([[TxLog.rowDeltas]]) as SQL:
  * every table column plus `_sign` (+1/−1) such that any linear
  * aggregate folds as `agg(to) = agg(from) ⊕ Σ(_sign · row)`. The
  * relational complement of `table_changes`: that one is a KEYED diff
  * (row identity by business key, insert/update/delete tags) for CDC
  * consumers; this one needs no keys and is what incremental aggregate
  * maintenance consumes — a user materializing their own rollup writes
  * `SELECT g, SUM(v * _sign) FROM table_deltas('t', :cursor) GROUP BY g`
  * and applies it, exactly what REFRESH MATERIALIZED VIEW automates.
  * Layout-only commits (OPTIMIZE / REORG) contribute nothing; cost is
  * O(files the window's commits touched), never O(snapshot).
  *
  * Arguments must be literals (plan built at analysis time, like
  * table_changes); `toVersion` defaults to the latest. The window must
  * lie above the log-retention horizon — expired windows refuse with
  * the remedy named, matching table_changes. */
object TableDeltasTvf {
  def plan(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 2 || es.length == 3,
      "table_deltas expects (table, fromVersion [, toVersion])")
    def arg(i: Int): Any = {
      require(es(i).foldable,
        s"table_deltas: argument ${i + 1} must be a literal")
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def asLong(i: Int): Long = arg(i) match {
      case n: java.lang.Number => n.longValue()
      case other => String.valueOf(other).trim.toLong
    }
    val spark = SparkSession.active
    val table = String.valueOf(arg(0))
    val latest = TxLog.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"table_deltas: txlog table $table has no commits"))
    val from = asLong(1)
    val to = if (es.length == 3) asLong(2) else latest
    require(from >= 0 && from <= to && to <= latest,
      s"table_deltas: version window [$from, $to] must lie in [0, $latest]")
    TxLog.retentionHorizon(table).foreach { h =>
      require(from >= h,
        s"table_deltas: window start $from is below the log-retention " +
          s"horizon $h of $table — expireLog deleted the snapshot to " +
          "delta against. Start at or above the horizon, or rebuild the " +
          "consumer from the current snapshot")
    }
    TxLog.rowDeltas(spark, table, from, to).queryExecution.analyzed
  }
}
