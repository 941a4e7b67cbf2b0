package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.txlog.TxLogRelation

/** Catalog-name DML for txlog tables (the DeltaAnalysis pattern): Spark's
  * stock parser turns `DELETE FROM t` / `UPDATE t SET …` on a CATALOG
  * table into v2 DeleteFromTable/UpdateTable plans, which fail the
  * operation check for v1 relations. This post-hoc resolution rule fires
  * AFTER the relation resolves — so the decision is made on the resolved
  * relation's provider, never on the name — and rewrites the plan onto
  * the graft command when (and only when) the target is a
  * [[TxLogRelation]]. Conditions and assignments are carried as their
  * SQL text (`Expression.sql`), so the command layer's single expression
  * path serves both the parser-extension route (`` txlog.`path` ``
  * targets) and this analyzer route (catalog names). A time-travel
  * relation (`versionAsOf`/`timestampAsOf`) refuses: DML against a
  * pinned historical snapshot has no meaning.
  *
  * MERGE by catalog name is intentionally NOT routed here: its clause
  * expressions resolve against BOTH sides and round-tripping them
  * through text would capture the analyzer's rewrites — use the
  * `` txlog.`path` `` target form, which binds aliases explicitly. */
case class GraftDmlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def relationOf(plan: LogicalPlan): Option[TxLogRelation] =
    plan match {
      case SubqueryAlias(_, child) => relationOf(child)
      case v: org.apache.spark.sql.catalyst.plans.logical.View =>
        relationOf(v.child)
      case lr: LogicalRelation => lr.relation match {
        case r: TxLogRelation => Some(r)
        case _ => None
      }
      case _ => None
    }

  private def writableTarget(plan: LogicalPlan): Option[String] =
    relationOf(plan).map { r =>
      require(r.asOf.isEmpty,
        s"DML on a time-travel txlog relation (${r.path}) is not allowed " +
          "— drop the versionAsOf/timestampAsOf option to write")
      r.path
    }

  /** Render an expression resolved against the catalog relation back to
    * text the command layer can re-parse against its own scan: resolved
    * attributes render FULLY QUALIFIED (`spark_catalog.default.t.k`),
    * which no later frame can resolve — drop the qualifier, the target
    * table is single-relation by construction. */
  private def sqlOf(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case DeleteFromTable(target, cond) if relationOf(target).isDefined =>
        DeleteFromTxLogCommand(
          SqlTarget(writableTarget(target), None), Some(sqlOf(cond)))
      case UpdateTable(target, assignments, cond)
          if relationOf(target).isDefined =>
        UpdateTxLogCommand(
          SqlTarget(writableTarget(target), None),
          assignments.map(a =>
            (Scan.unquoteIdent(sqlOf(a.key)), sqlOf(a.value))),
          cond.map(sqlOf))
    }
}
