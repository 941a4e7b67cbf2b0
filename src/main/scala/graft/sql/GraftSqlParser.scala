package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the txlog DML tier (the `DeltaSqlParser` pattern): a
  * delegating [[ParserInterface]] that recognizes the DML/maintenance
  * statements Spark's own parser cannot route to a v1 path-based table —
  *
  *   - `DELETE FROM txlog.`/path` [WHERE …]`
  *   - `UPDATE txlog.`/path` SET c = e, … [WHERE …]`
  *   - `MERGE INTO txlog.`/path` [AS] t USING src|(query) [AS] s ON …
  *      WHEN MATCHED [AND …] THEN UPDATE SET *|c = e, …
  *      WHEN MATCHED [AND …] THEN DELETE
  *      WHEN NOT MATCHED [BY TARGET] [AND …] THEN INSERT *|(c, …) VALUES …
  *      WHEN NOT MATCHED BY SOURCE [AND …] THEN UPDATE SET c = e, …|DELETE`
  *   - `INSERT INTO txlog.`/path` [(c,…)] [REPLACE WHERE …] <query>` /
  *     `INSERT OVERWRITE [TABLE] txlog.`/path` [PARTITION (…)] <query>`
  *   - `COPY INTO <t> FROM '<dir>' [FILEFORMAT = …] [FORMAT_OPTIONS (…)]
  *     [FORCE = true]`
  *   - `OPTIMIZE <t> [WHERE part = v …] [ZORDER BY (a[, b])]`
  *   - `VACUUM <t> [LITE] [RETAIN n VERSIONS | n HOURS] [DRY RUN]`
  *   - `TRUNCATE TABLE <t>`
  *   - `ALTER TABLE txlog.`/path` SET PARTITIONED BY (c, …)` (partition
  *     spec evolution; `()` unpartitions)
  *   - `SHOW TBLPROPERTIES txlog.`/path``
  *
  * — and lowers them onto the TxLog API commands
  * ([[DeleteFromTxLogCommand]] &c.). Everything else passes through to
  * the delegate verbatim. DELETE/UPDATE/MERGE are intercepted ONLY for
  * the explicit `` txlog.`path` `` target form, so catalog-table DML for
  * other providers keeps its stock behavior; OPTIMIZE/VACUUM (verbs the
  * stock parser does not know at all) also accept a catalog table name
  * created with `USING graft.sources.txlog`.
  *
  * Statement skeletons are recognized with a quote/paren/comment-aware
  * scanner; every embedded EXPRESSION (conditions, SET values, INSERT
  * values) is carried as raw text and parsed by the live session at run
  * time — one expression grammar, Spark's own. Installed by
  * [[graft.functions.GraftExtensions]] via `injectParser`. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDml.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Statement recognizer. Returns None for anything that is not a graft
  * DML statement (the caller then delegates); throws with a pointed
  * message for a statement that IS ours but malformed — falling through
  * to the stock parser there would produce a misleading error. */
object GraftSqlDml {

  def parse(sqlText: String): Option[LogicalPlan] = {
    val s = new Scan(sqlText)
    if (s.kws("DELETE", "FROM")) parseDelete(s)
    else if (s.kw("UPDATE")) parseUpdate(s)
    else if (s.kws("MERGE", "INTO")) parseMerge(s, evolve = false)
    else if (s.kws("MERGE", "WITH", "SCHEMA", "EVOLUTION", "INTO"))
      parseMerge(s, evolve = true)
    else if (s.kw("OPTIMIZE")) parseOptimize(s)
    else if (s.kw("VACUUM")) parseVacuum(s)
    else if (s.kws("DESCRIBE", "HISTORY") || s.kws("DESC", "HISTORY"))
      target(s, allowIdent = true).map { t =>
        require(s.eof, s"unexpected trailing input in DESCRIBE HISTORY $t")
        DescribeHistoryTxLogCommand(t)
      }
    else if (s.kws("DESCRIBE", "DETAIL") || s.kws("DESC", "DETAIL"))
      target(s, allowIdent = true).map { t =>
        require(s.eof, s"unexpected trailing input in DESCRIBE DETAIL $t")
        DescribeDetailTxLogCommand(t)
      }
    else if (s.kw("DESCRIBE") || s.kw("DESC")) {
      // plain DESCRIBE, path form only (`DESCRIBE <ident>` keeps its
      // stock catalog behavior): the logged schema's columns + types,
      // partition columns marked — what `DESCRIBE delta.`/p`` shows
      s.kw("TABLE")
      val p0 = s.pos
      target(s, allowIdent = false) match {
        case Some(t) if s.eof => Some(DescribeTxLogCommand(t))
        case _ => { s.reset(p0); None } // not ours — delegate
      }
    }
    else if (s.kws("FSCK", "REPAIR", "TABLE"))
      target(s, allowIdent = true).map { t =>
        val dry = s.kws("DRY", "RUN")
        require(s.eof, s"unexpected trailing input in FSCK REPAIR TABLE $t")
        FsckTxLogCommand(t, dry)
      }
    else if (s.kws("SHOW", "COLUMNS")) {
      // path form only: SHOW COLUMNS {IN|FROM} <ident> is a stock verb
      val p0 = s.pos
      if (!s.kw("IN") && !s.kw("FROM")) { s.reset(p0); None }
      else target(s, allowIdent = false) match {
        case Some(t) if s.eof => Some(ShowColumnsTxLogCommand(t))
        case _ => { s.reset(p0); None }
      }
    }
    else if (s.kws("SHOW", "PARTITIONS"))
      // path form only: SHOW PARTITIONS <ident> is a stock verb
      target(s, allowIdent = false).map { t =>
        require(s.eof, s"unexpected trailing input in SHOW PARTITIONS $t")
        ShowPartitionsTxLogCommand(t)
      }
    else if (s.kws("SHOW", "CREATE", "TABLE"))
      // path form only: SHOW CREATE TABLE <ident> is a stock verb
      target(s, allowIdent = false).map { t =>
        require(s.eof, s"unexpected trailing input in SHOW CREATE TABLE $t")
        ShowCreateTableTxLogCommand(t)
      }
    else if (s.kws("SHOW", "TBLPROPERTIES"))
      // path form only: SHOW TBLPROPERTIES <ident> is a stock verb
      target(s, allowIdent = false).map { t =>
        require(s.eof, s"unexpected trailing input in SHOW TBLPROPERTIES $t")
        ShowTxLogPropertiesCommand(t)
      }
    else if (s.kws("TRUNCATE", "TABLE"))
      // lowers onto the unconditional row DELETE: one copy-on-write (or
      // DV) commit emptying the table; the schema, properties, and every
      // prior version stay — time travel still reads the old rows.
      // PATH form only: `TRUNCATE TABLE <ident>` is a stock verb and
      // must keep its stock behavior for non-txlog catalog tables
      target(s, allowIdent = false).map { t =>
        require(s.eof, s"unexpected trailing input in TRUNCATE TABLE $t")
        DeleteFromTxLogCommand(t, None)
      }
    else if (s.kw("INSERT")) parseInsert(s)
    else if (s.kw("CREATE")) parseCreate(s)
    else if (s.kws("REFRESH", "MATERIALIZED", "VIEW"))
      target(s, allowIdent = true).map { t =>
        val full = s.kw("FULL")
        require(s.eof,
          s"unexpected trailing input in REFRESH MATERIALIZED VIEW $t")
        RefreshMviewCommand(t, full)
      }
    else if (s.kws("COPY", "INTO")) parseCopyInto(s)
    else if (s.kw("RESTORE")) { s.kw("TABLE"); parseRestore(s) }
    else if (s.kws("ANALYZE", "TABLE")) {
      // PATH form only (`ANALYZE TABLE <ident>` keeps Spark's stock
      // catalog-statistics behavior): compute and persist table/column
      // statistics into the log's properties
      val p0 = s.pos
      target(s, allowIdent = false) match {
        case Some(t) =>
          require(s.kws("COMPUTE", "STATISTICS"),
            s"ANALYZE TABLE $t: expected COMPUTE STATISTICS")
          if (s.kw("NOSCAN")) {
            require(s.eof, s"unexpected trailing input in ANALYZE TABLE $t")
            Some(AnalyzeTxLogCommand(t, Seq.empty, allCols = false,
              noscan = true))
          } else if (s.kws("FOR", "ALL", "COLUMNS")) {
            require(s.eof, s"unexpected trailing input in ANALYZE TABLE $t")
            Some(AnalyzeTxLogCommand(t, Seq.empty, allCols = true,
              noscan = false))
          } else if (s.kws("FOR", "COLUMNS")) {
            val cols = scala.collection.mutable.ArrayBuffer.empty[String]
            var more = true
            while (more) {
              cols += s.identPart().getOrElse(
                throw new IllegalArgumentException(
                  s"ANALYZE TABLE $t: expected a column name"))
              more = s.punct(',')
            }
            require(s.eof, s"unexpected trailing input in ANALYZE TABLE $t")
            Some(AnalyzeTxLogCommand(t, cols.toSeq, allCols = false,
              noscan = false))
          } else {
            require(s.eof, s"unexpected trailing input in ANALYZE TABLE $t")
            Some(AnalyzeTxLogCommand(t, Seq.empty, allCols = false,
              noscan = false))
          }
        case None => { s.reset(p0); None } // ident form — stock verb
      }
    }
    else if (s.kws("GENERATE", "SYMLINK_FORMAT_MANIFEST", "FOR", "TABLE"))
      // Delta's `GENERATE symlink_format_manifest FOR TABLE t`
      target(s, allowIdent = true).map { t =>
        require(s.eof, s"unexpected trailing input in GENERATE FOR TABLE $t")
        GenerateManifestCommand(t)
      }
    else if (s.kw("GENERATE")) throw new IllegalArgumentException(
      "GENERATE: only symlink_format_manifest is supported " +
        "(GENERATE symlink_format_manifest FOR TABLE <t>)")
    else if (s.kws("REORG", "TABLE"))
      // Delta's `REORG TABLE t APPLY (PURGE)`: materialize DV deletes
      // and drop retired-column bytes by rewriting exactly the carriers
      target(s, allowIdent = true).map { t =>
        require(s.kw("APPLY") && s.punct('('),
          s"REORG TABLE $t: expected APPLY (PURGE)")
        val body = s.parenBody().trim
        require(body.equalsIgnoreCase("PURGE"),
          s"REORG TABLE $t: only APPLY (PURGE) is supported, got ($body)")
        require(s.eof, s"unexpected trailing input in REORG TABLE $t")
        ReorgTxLogCommand(t)
      }
    else if (s.kws("ALTER", "TABLE")) parseAlter(s)
    else if (s.kws("CONVERT", "TO", "TXLOG")) parseConvert(s)
    else None
  }

  private def parseRestore(s: Scan): Option[LogicalPlan] =
    target(s, allowIdent = true).map { t =>
      require(s.kw("TO"), s"RESTORE $t: expected TO VERSION/TIMESTAMP AS OF")
      if (s.kws("VERSION", "AS", "OF")) {
        val v = s.word().map(_.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"RESTORE $t: expected a version number"))
        require(s.eof, s"unexpected trailing input in RESTORE $t")
        RestoreTxLogCommand(t, Some(v), None)
      } else if (s.kws("TIMESTAMP", "AS", "OF")) {
        val ts = s.quoted().orElse(s.word()).getOrElse(
          throw new IllegalArgumentException(
            s"RESTORE $t: expected a timestamp (millis or 'yyyy-MM-dd HH:mm:ss')"))
        require(s.eof, s"unexpected trailing input in RESTORE $t")
        RestoreTxLogCommand(t, None, Some(ts))
      } else throw new IllegalArgumentException(
        s"RESTORE $t: expected VERSION AS OF or TIMESTAMP AS OF")
    }

  private def parseAlter(s: Scan): Option[LogicalPlan] =
    // path form ONLY: ALTER TABLE <ident> is a stock verb for catalog
    // tables and must keep its stock behavior
    target(s, allowIdent = false).map { t =>
      if (s.kws("CLUSTER", "BY")) {
        // Delta's liquid `ALTER TABLE … CLUSTER BY (…)`: declares the
        // clustered-write columns (graft.cluster.columns) — every
        // subsequent unpartitioned write range-clusters itself; NONE
        // (or ()) retires the declaration
        if (s.kw("NONE")) {
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterClusterByTxLogCommand(t, Nil)
        } else {
          require(s.punct('('), s"ALTER TABLE $t: expected (col, …) or NONE")
          val cols = Scan.splitTop(s.parenBody(), ',')
            .map(Scan.unquoteIdent).filter(_.nonEmpty)
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterClusterByTxLogCommand(t, cols)
        }
      } else if (s.kws("SET", "PARTITIONED", "BY")) {
        // partition spec evolution (Iceberg-style): metadata-only layout
        // change; () unpartitions. Lowers onto TxLog.alterPartitioning.
        require(s.punct('('), s"ALTER TABLE $t: expected (col, …) or ()")
        val cols = Scan.splitTop(s.parenBody(), ',')
          .map(Scan.unquoteIdent).filter(_.nonEmpty)
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterPartitioningTxLogCommand(t, cols)
      } else if (s.kws("SET", "TBLPROPERTIES")) {
        require(s.punct('('), s"ALTER TABLE $t: expected (k=v, …)")
        val set = Scan.splitTop(s.parenBody(), ',').map { a =>
          val (k, v) = Scan.splitAssign(a)
          (Scan.unquote(k), Scan.unquote(v))
        }
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterTxLogTableCommand(t, set, Nil, None)
      } else if (s.kws("UNSET", "TBLPROPERTIES")) {
        require(s.punct('('), s"ALTER TABLE $t: expected (k, …)")
        val keys = Scan.splitTop(s.parenBody(), ',').map(Scan.unquote)
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterTxLogTableCommand(t, Nil, keys, None)
      } else if (s.kws("ADD", "CONSTRAINT")) {
        val name = s.identPart().getOrElse(
          throw new IllegalArgumentException(
            s"ALTER TABLE $t: expected a constraint name"))
        require(s.kw("CHECK") && s.punct('('),
          s"ALTER TABLE $t: expected CHECK (expr)")
        val check = s.parenBody()
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterTxLogTableCommand(t, Nil, Nil, Some((name, check)))
      } else if (s.kws("DROP", "CONSTRAINT")) {
        val name = s.identPart().getOrElse(
          throw new IllegalArgumentException(
            s"ALTER TABLE $t: expected a constraint name"))
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterTxLogTableCommand(t, Nil, Nil, None, Some(name))
      } else if (s.kws("RENAME", "COLUMN")) {
        val from = s.identPart().getOrElse(throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected a column name after RENAME COLUMN"))
        require(s.kw("TO"), s"ALTER TABLE $t: expected TO <new name>")
        val to = s.identPart().getOrElse(throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected a new column name after TO"))
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterColumnTxLogCommand(t, RenameColumnAction(from, to))
      } else if (s.kws("DROP", "COLUMN")) {
        val name = s.identPart().getOrElse(throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected a column name after DROP COLUMN"))
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterColumnTxLogCommand(t, DropColumnAction(name))
      } else if (s.kws("ALTER", "COLUMN") || s.kws("CHANGE", "COLUMN")) {
        val name = s.identPart().getOrElse(throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected a column name after ALTER COLUMN"))
        if (s.kw("TYPE")) {
          // Delta's type widening: `ALTER COLUMN c TYPE <wider>` — a
          // metadata-only schema commit; old files up-convert at scan
          val ty = s.until().trim
          require(ty.nonEmpty,
            s"ALTER TABLE $t: ALTER COLUMN $name TYPE is missing a type")
          AlterColumnTxLogCommand(t, WidenColumnAction(name, ty))
        } else if (s.kws("SET", "NOT", "NULL")) {
          // sugar over the CHECK tier — the same `<col>_not_null`
          // constraint the column-list CREATE form declares, so SHOW
          // CREATE TABLE renders it back inline; addConstraint
          // validates existing rows first (a NULL-holding column
          // refuses, like Delta)
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterTxLogTableCommand(t, Nil, Nil,
            Some((s"${name}_not_null", s"$name IS NOT NULL")))
        } else if (s.kws("DROP", "NOT", "NULL")) {
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterTxLogTableCommand(t, Nil, Nil, None,
            Some(s"${name}_not_null"))
        } else if (s.kws("SET", "DEFAULT")) {
          // Delta's column DEFAULT: applies to SQL INSERTs that OMIT the
          // column (column-list form); existing rows are untouched
          val e = s.until().trim
          require(e.nonEmpty,
            s"ALTER TABLE $t: SET DEFAULT on $name is missing an expression")
          AlterColumnDefaultCommand(t, name, Some(e))
        } else if (s.kws("DROP", "DEFAULT")) {
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterColumnDefaultCommand(t, name, None)
        } else throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected TYPE <data type>, SET NOT NULL, " +
            "DROP NOT NULL, SET DEFAULT <expr>, or DROP DEFAULT " +
            s"after ALTER COLUMN $name")
      } else if (s.kws("ADD", "COLUMNS")) {
        require(s.punct('('), s"ALTER TABLE $t: expected (name type, …)")
        val cols = Scan.splitTop(s.parenBody(), ',').map { part =>
          val ps = new Scan(part)
          val n = ps.identPart().getOrElse(throw new IllegalArgumentException(
            s"ALTER TABLE $t: expected `name type` in ADD COLUMNS, got '$part'"))
          val ty = ps.until().trim
          require(ty.nonEmpty,
            s"ALTER TABLE $t: column $n in ADD COLUMNS is missing a type")
          (n, ty)
        }
        require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
        AlterColumnTxLogCommand(t, AddColumnsAction(cols))
      } else if (s.kws("ADD", "COLUMN")) {
        val name = s.identPart().getOrElse(throw new IllegalArgumentException(
          s"ALTER TABLE $t: expected a column name after ADD COLUMN"))
        val ty = s.until("GENERATED").trim
        require(ty.nonEmpty,
          s"ALTER TABLE $t: ADD COLUMN $name is missing a type")
        // Delta's `ADD COLUMN g TYPE GENERATED ALWAYS AS (expr)` and
        // `… GENERATED ALWAYS AS IDENTITY [(START WITH s [INCREMENT BY
        // i])]`: the expression form lands a schema-evolution commit AND
        // declares the generation expression; the IDENTITY form routes
        // to the row-tracking-backed identity declaration (one commit)
        if (s.kws("GENERATED", "ALWAYS", "AS")) {
          if (s.kw("IDENTITY")) {
            val (start, step) = identitySpec(s, s"ALTER TABLE $t")
            require(ty.equalsIgnoreCase("BIGINT") ||
              ty.equalsIgnoreCase("LONG"),
              s"ALTER TABLE $t: identity column $name must be BIGINT, " +
                s"got $ty")
            require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
            AlterColumnTxLogCommand(t,
              IdentityColumnAction(name, start, step))
          } else {
            require(s.punct('('),
              s"ALTER TABLE $t: expected GENERATED ALWAYS AS (expr) " +
                "or GENERATED ALWAYS AS IDENTITY")
            val e = s.parenBody()
            require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
            AlterColumnTxLogCommand(t,
              AddColumnsAction(Seq(name -> ty), Some(name -> e)))
          }
        } else {
          require(s.eof, s"unexpected trailing input in ALTER TABLE $t")
          AlterColumnTxLogCommand(t, AddColumnsAction(Seq(name -> ty)))
        }
      } else throw new IllegalArgumentException(
        s"ALTER TABLE $t supports SET/UNSET TBLPROPERTIES, " +
          "ALTER COLUMN … TYPE …, " +
          "ADD CONSTRAINT … CHECK (…), DROP CONSTRAINT, RENAME COLUMN " +
          "… TO …, DROP COLUMN, and ADD COLUMN(S)")
    }

  private def parseConvert(s: Scan): Option[LogicalPlan] = {
    // CONVERT TO TXLOG parquet.`/dir` (or a bare `/dir`)
    val p0 = s.pos
    val dir = s.word() match {
      case Some(w) if w.equalsIgnoreCase("parquet") && s.punct('.') =>
        s.backquoted()
      case _ => { s.reset(p0); s.backquoted() }
    }
    dir.map { d =>
      val parts =
        if (s.kws("PARTITIONED", "BY")) {
          require(s.punct('('), "CONVERT TO TXLOG: expected (cols)")
          Scan.splitTop(s.parenBody(), ',').map(Scan.unquote)
        } else Seq.empty
      require(s.eof, s"unexpected trailing input in CONVERT TO TXLOG `$d`")
      ConvertToTxLogCommand(d, parts): LogicalPlan
    }
  }

  /** `` txlog.`path` `` (always intercepted) or, when `allowIdent`, a
    * bare [multipart] table identifier. */
  private def target(s: Scan, allowIdent: Boolean): Option[SqlTarget] = {
    val p0 = s.pos
    s.word() match {
      case Some(w) if w.equalsIgnoreCase("txlog") && s.punct('.') =>
        s.backquoted() match {
          case Some(path) => Some(SqlTarget(Some(path), None))
          case None => { s.reset(p0); None }
        }
      case Some(w) if allowIdent =>
        var parts = List(w)
        while (s.punct('.'))
          parts = parts :+ s.identPart().getOrElse(return None)
        Some(SqlTarget(None, Some(parts.mkString("."))))
      case _ => { s.reset(p0); None }
    }
  }

  private def parseDelete(s: Scan): Option[LogicalPlan] =
    target(s, allowIdent = false).map { t =>
      val where = if (s.kw("WHERE")) Some(s.until()) else None
      require(s.eof, s"unexpected trailing input in DELETE FROM $t")
      DeleteFromTxLogCommand(t, where)
    }

  private def parseUpdate(s: Scan): Option[LogicalPlan] =
    target(s, allowIdent = false).map { t =>
      require(s.kw("SET"), s"UPDATE $t: expected SET")
      val setText = s.until("WHERE")
      val sets = Scan.splitTop(setText, ',').map { a =>
        val (c, e) = Scan.splitAssign(a)
        (Scan.unquoteIdent(c), e)
      }
      require(sets.nonEmpty, s"UPDATE $t: empty SET list")
      val where = if (s.kw("WHERE")) Some(s.until()) else None
      require(s.eof, s"unexpected trailing input in UPDATE $t")
      UpdateTxLogCommand(t, sets, where)
    }

  /** `INSERT INTO txlog.`p` [(c,…)] [REPLACE WHERE cond] <query>` and
    * `INSERT OVERWRITE [TABLE] txlog.`p` [PARTITION (c=v|c, …)] [(c,…)]
    * <query>` — path form ONLY: stock `INSERT INTO <ident>` keeps its
    * stock route (TxLogRelation is an InsertableRelation, so catalog
    * tables already insert through Spark itself). The query tail
    * (SELECT … / VALUES … / WITH …) is carried verbatim and parsed by
    * the live session at run time — one query grammar, Spark's own. */
  private def parseInsert(s: Scan): Option[LogicalPlan] = {
    val overwrite =
      if (s.kw("INTO")) false
      else if (s.kw("OVERWRITE")) true
      else return None
    s.kw("TABLE")
    target(s, allowIdent = false).map { t =>
      val parts: Seq[(String, Option[String])] =
        if (overwrite && s.kw("PARTITION")) {
          require(s.punct('('),
            s"INSERT OVERWRITE $t: expected PARTITION (c = v, …)")
          Scan.splitTop(s.parenBody(), ',').map { p =>
            if (p.contains('=')) {
              val (c, v) = Scan.splitAssign(p)
              (Scan.unquoteIdent(c), Some(v))
            } else (Scan.unquoteIdent(p.trim), None) // dynamic mention
          }
        } else Seq.empty
      // `(c1, c2, …)` is a column list; `(SELECT …)` is the query —
      // disambiguate on the first keyword inside the parens
      val p0 = s.pos
      val cols: Seq[String] =
        if (s.punct('(') &&
            !s.peekKw("SELECT") && !s.peekKw("WITH") &&
            !s.peekKw("VALUES") && !s.peekKw("FROM") && !s.peekKw("TABLE")) {
          Scan.splitTop(s.parenBody(), ',').map(c =>
            Scan.unquoteIdent(c.trim))
        } else { s.reset(p0); Seq.empty }
      val replace =
        if (!overwrite && s.kws("REPLACE", "WHERE"))
          Some(s.until("SELECT", "VALUES", "WITH", "FROM", "TABLE"))
        else None
      val query = s.until()
      require(query.nonEmpty, s"INSERT into $t: expected a query " +
        "(SELECT …, VALUES …, WITH …) after the target")
      replace.foreach(r => require(r.nonEmpty,
        s"INSERT INTO $t: empty REPLACE WHERE condition"))
      InsertIntoTxLogCommand(t, overwrite, parts, cols, replace, query)
    }
  }

  /** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] txlog.`p` …` — the two
    * graft DDL forms, PATH target only (`CREATE TABLE <ident>` keeps
    * its stock catalog route):
    *   - `… [SHALLOW|DEEP] CLONE <src> [VERSION AS OF n |
    *     TIMESTAMP AS OF ts]` (bare CLONE = DEEP, Databricks' default)
    *   - `… [USING <provider>] [PARTITIONED BY (c, …)]
    *     [TBLPROPERTIES ('k' = 'v', …)] AS <query>` */
  /** Optional `(START WITH n [INCREMENT BY n])` after IDENTITY. */
  private def identitySpec(s: Scan, ctx: String): (Long, Long) = {
    var start = 1L
    var step = 1L
    if (s.punct('(')) {
      val ps = new Scan(s.parenBody())
      def signed(what: String): Long = {
        val neg = ps.punct('-')
        val n = ps.word().map(_.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"$ctx: expected a number after $what"))
        if (neg) -n else n
      }
      if (ps.kws("START", "WITH")) start = signed("START WITH")
      if (ps.kws("INCREMENT", "BY")) step = signed("INCREMENT BY")
      require(ps.eof,
        s"$ctx: unexpected input in IDENTITY (…) — " +
          "expected [START WITH n] [INCREMENT BY n]")
    }
    (start, step)
  }

  /** The CREATE TABLE tail clauses, any order: `USING <provider>`
    * (txlog only, and implied), `PARTITIONED BY (c, …)`,
    * `TBLPROPERTIES ('k' = 'v', …)`. */
  private def tableClauses(s: Scan,
      t: SqlTarget): (Seq[String], Seq[(String, String)]) = {
    var partCols = Seq.empty[String]
    var props = Seq.empty[(String, String)]
    var more = true
    while (more) { // clauses in any order, like the stock grammar
      if (s.kw("USING")) {
        // `USING txlog` / `USING graft.sources.txlog` accepted
        // (and implied); any other provider is not ours
        val prov = new StringBuilder(s.word().getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE $t: expected a provider after USING")))
        while (s.punct('.')) prov.append('.')
          .append(s.word().getOrElse(""))
        require(prov.toString.equalsIgnoreCase("txlog") ||
          prov.toString.equalsIgnoreCase("graft.sources.txlog"),
          s"CREATE TABLE $t: path-form CREATE supports only the " +
            s"txlog provider, got USING $prov")
      } else if (s.kws("PARTITIONED", "BY")) {
        require(s.punct('('),
          s"CREATE TABLE $t: expected PARTITIONED BY (c, …)")
        partCols = Scan.splitTop(s.parenBody(), ',')
          .map(Scan.unquoteIdent)
      } else if (s.kw("TBLPROPERTIES")) {
        require(s.punct('('),
          s"CREATE TABLE $t: expected ('k' = 'v', …)")
        props = Scan.splitTop(s.parenBody(), ',').map { a =>
          val (k, v) = Scan.splitAssign(a)
          (Scan.unquote(k), Scan.unquote(v))
        }
      } else more = false
    }
    (partCols, props)
  }

  /** One `name type [NOT NULL] [GENERATED ALWAYS AS (expr) |
    * GENERATED ALWAYS AS IDENTITY [(START WITH n INCREMENT BY n)]]`
    * or `CONSTRAINT name CHECK (expr)` item of a column-list CREATE. */
  private def parseColumnItem(t: SqlTarget, item: String,
      out: CreateColumnsBuilder): Unit = {
    val ps = new Scan(item)
    if (ps.kw("CONSTRAINT")) {
      val n = ps.identPart().getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $t: expected a constraint name after CONSTRAINT"))
      require(ps.kw("CHECK") && ps.punct('('),
        s"CREATE TABLE $t: expected CONSTRAINT $n CHECK (expr)")
      out.checks :+= (n -> ps.parenBody())
      require(ps.eof,
        s"CREATE TABLE $t: unexpected trailing input after CONSTRAINT $n")
      return
    }
    val n = ps.identPart().getOrElse(throw new IllegalArgumentException(
      s"CREATE TABLE $t: expected `name type` in the column list, " +
        s"got '$item'"))
    val ty = ps.until("NOT", "GENERATED").trim
    require(ty.nonEmpty, s"CREATE TABLE $t: column $n is missing a type")
    var more = true
    while (more) {
      if (ps.kws("NOT", "NULL")) out.notNull :+= n
      else if (ps.kws("GENERATED", "ALWAYS", "AS")) {
        if (ps.kw("IDENTITY")) {
          require(ty.equalsIgnoreCase("BIGINT") ||
            ty.equalsIgnoreCase("LONG"),
            s"CREATE TABLE $t: identity column $n must be BIGINT, got $ty")
          val (st, sp) = identitySpec(ps, s"CREATE TABLE $t")
          out.identities :+= ((n, st, sp))
        } else {
          require(ps.punct('('),
            s"CREATE TABLE $t: expected GENERATED ALWAYS AS (expr) or " +
              s"… AS IDENTITY for column $n")
          out.generated :+= (n -> ps.parenBody())
        }
      } else more = false
    }
    require(ps.eof,
      s"CREATE TABLE $t: unexpected trailing input in column " +
        s"definition '$item'")
    out.cols :+= (n -> ty)
  }

  private final class CreateColumnsBuilder {
    var cols = Seq.empty[(String, String)]
    var notNull = Seq.empty[String]
    var generated = Seq.empty[(String, String)]
    var identities = Seq.empty[(String, Long, Long)]
    var checks = Seq.empty[(String, String)]
  }

  private def parseCreate(s: Scan): Option[LogicalPlan] = {
    val orReplace = s.kws("OR", "REPLACE")
    if (s.kws("MATERIALIZED", "VIEW")) {
      // CREATE [OR REPLACE] MATERIALIZED VIEW txlog.`/p` AS <query> —
      // path form only (the stock parser owns catalog views); the query
      // grammar is validated by Mview.parseDef at run time
      val t = target(s, allowIdent = false).getOrElse(
        throw new IllegalArgumentException(
          "CREATE MATERIALIZED VIEW: expected a txlog.`/path` target"))
      require(s.kw("AS"),
        s"CREATE MATERIALIZED VIEW $t: expected AS <query>")
      val q = s.until()
      require(q.nonEmpty, s"CREATE MATERIALIZED VIEW $t AS: empty query")
      return Some(CreateMviewCommand(t, q, orReplace))
    }
    if (!s.kw("TABLE")) return None
    val ifNotExists = s.kws("IF", "NOT", "EXISTS")
    target(s, allowIdent = false).map { t =>
      require(!(orReplace && ifNotExists),
        s"CREATE TABLE $t: OR REPLACE and IF NOT EXISTS are mutually " +
          "exclusive")
      if (s.punct('(')) {
        // Delta's column-list CREATE: full schema DDL with NOT NULL /
        // GENERATED ALWAYS AS (expr) / GENERATED ALWAYS AS IDENTITY /
        // CONSTRAINT … CHECK (…) — the natural home for identity
        // columns (Delta likewise allows them only at creation)
        val out = new CreateColumnsBuilder
        Scan.splitTop(s.parenBody(), ',').foreach(parseColumnItem(t, _, out))
        require(out.cols.nonEmpty, s"CREATE TABLE $t: empty column list")
        val (partCols, props) = tableClauses(s, t)
        require(s.eof,
          s"unexpected trailing input in CREATE TABLE $t — the " +
            "column-list form does not take AS <query> (use CTAS " +
            "without a column list)")
        return Some(CreateTableTxLogCommand(t, out.cols, out.notNull,
          out.generated, out.identities, out.checks, partCols,
          props.toMap, orReplace, ifNotExists))
      }
      val deep =
        if (s.kws("SHALLOW", "CLONE")) Some(false)
        else if (s.kws("DEEP", "CLONE")) Some(true)
        else if (s.kw("CLONE")) Some(true)
        else None
      deep match {
        case Some(d) =>
          val src = target(s, allowIdent = true).getOrElse(
            throw new IllegalArgumentException(
              s"CREATE TABLE $t CLONE: expected a source table " +
                "(txlog.`path` or a catalog txlog table)"))
          val (ver, ts) =
            if (s.kws("VERSION", "AS", "OF"))
              (Some(s.word().map(_.toLong).getOrElse(
                throw new IllegalArgumentException(
                  s"CREATE TABLE $t CLONE: expected a version number"))),
                None)
            else if (s.kws("TIMESTAMP", "AS", "OF"))
              (None, Some(s.quoted().orElse(s.word()).getOrElse(
                throw new IllegalArgumentException(
                  s"CREATE TABLE $t CLONE: expected a timestamp " +
                    "(millis or 'yyyy-MM-dd HH:mm:ss')"))))
            else (None, None)
          require(s.eof,
            s"unexpected trailing input in CREATE TABLE $t CLONE")
          CloneTxLogCommand(t, src, d, orReplace, ifNotExists, ver, ts)
            : LogicalPlan
        case None =>
          val (partCols, props) = tableClauses(s, t)
          require(s.kw("AS"),
            s"CREATE TABLE $t: expected AS <query> — graft path tables " +
              "define their schema from the query (or first write; a " +
              "column-list CREATE belongs to the stock catalog form)")
          val q = s.until()
          require(q.nonEmpty, s"CREATE TABLE $t AS: empty query")
          CtasTxLogCommand(t, q, orReplace, ifNotExists, partCols,
            props.toMap): LogicalPlan
      }
    }
  }

  /** `COPY INTO <t> FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
    * [FORMAT_OPTIONS ('k' = 'v', …)] [FORCE = true]` — Delta's
    * idempotent bulk ingestion verb (a verb the stock parser does not
    * know at all, so like OPTIMIZE/VACUUM it accepts both the path form
    * and a catalog table name). */
  private def parseCopyInto(s: Scan): Option[LogicalPlan] =
    target(s, allowIdent = true).map { t =>
      require(s.kw("FROM"), s"COPY INTO $t: expected FROM '<path>'")
      val src = s.quoted().getOrElse(throw new IllegalArgumentException(
        s"COPY INTO $t: expected a quoted source path after FROM"))
      var fmt = "parquet"
      var opts = Seq.empty[(String, String)]
      var force = false
      var merge = false
      var pattern: Option[String] = None
      var more = true
      while (more) { // clauses accepted in any order, like Delta
        if (s.kw("FILEFORMAT")) {
          require(s.punct('='), s"COPY INTO $t: expected FILEFORMAT = <fmt>")
          fmt = s.word().getOrElse(throw new IllegalArgumentException(
            s"COPY INTO $t: expected a format name after FILEFORMAT =")
          ).toLowerCase
        } else if (s.kw("FORMAT_OPTIONS")) {
          require(s.punct('('), s"COPY INTO $t: expected ('k' = 'v', …)")
          opts = Scan.splitTop(s.parenBody(), ',').map { a =>
            val (k, v) = Scan.splitAssign(a)
            (Scan.unquote(k), Scan.unquote(v))
          }
        } else if (s.kw("PATTERN")) {
          require(s.punct('='), s"COPY INTO $t: expected PATTERN = '<glob>'")
          pattern = Some(s.quoted().getOrElse(
            throw new IllegalArgumentException(
              s"COPY INTO $t: expected a quoted glob after PATTERN =")))
        } else if (s.kw("COPY_OPTIONS")) {
          // Delta's COPY_OPTIONS namespace: 'force' and 'mergeSchema'
          require(s.punct('('), s"COPY INTO $t: expected ('k' = 'v', …)")
          Scan.splitTop(s.parenBody(), ',').foreach { a =>
            val (k, v) = Scan.splitAssign(a)
            (Scan.unquote(k).toLowerCase, Scan.unquote(v)) match {
              case ("force", x) => force = x.equalsIgnoreCase("true")
              case ("mergeschema", x) => merge = x.equalsIgnoreCase("true")
              case (other, _) => throw new IllegalArgumentException(
                s"COPY INTO $t: unknown COPY_OPTIONS key '$other' " +
                  "(supported: 'force', 'mergeSchema')")
            }
          }
        } else if (s.kw("FORCE")) {
          require(s.punct('='), s"COPY INTO $t: expected FORCE = true|false")
          force = s.word().exists(_.equalsIgnoreCase("true"))
        } else more = false
      }
      require(s.eof, s"unexpected trailing input in COPY INTO $t")
      CopyIntoTxLogCommand(t, src, fmt, opts.toMap, force, pattern, merge)
    }

  /** Expression text up to the next top-level `stop` keyword that is
    * FOLLOWED by one of `next` — a CASE expression's own WHEN/THEN
    * never is, so MERGE conditions and SET lists may contain
    * `CASE WHEN … THEN … END` freely (a bare until(stop) would truncate
    * at the CASE's first WHEN/THEN). */
  private def untilClause(s: Scan, stop: String, next: String*): String = {
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val part = s.until(stop)
      if (sb.nonEmpty) sb.append(" ").append(stop).append(" ")
      sb.append(part)
      if (s.eof) done = true
      else {
        val atStop = s.pos
        s.kw(stop) // consume tentatively to peek past it
        val boundary = next.exists { n =>
          val q = s.pos
          val hit = n.split(" ").forall(s.kw)
          s.reset(q)
          hit
        }
        if (boundary) { s.reset(atStop); done = true }
        // else: interior (CASE) keyword — keep scanning past it; the
        // consumed text re-appends on the next pass
      }
    }
    sb.toString.trim
  }

  private def parseMerge(s: Scan, evolve: Boolean): Option[LogicalPlan] =
    target(s, allowIdent = false).map { t =>
      s.kw("AS")
      val tAlias = if (s.peekKw("USING")) None else s.identPart()
      require(s.kw("USING"), s"MERGE INTO $t: expected USING")
      val (srcTable, srcQuery) =
        if (s.punct('(')) (None, Some(s.parenBody()))
        else (Some(s.identPart().getOrElse(
          throw new IllegalArgumentException(
            s"MERGE INTO $t: expected a source table or (query) after USING"))),
          None)
      s.kw("AS")
      val sAlias = if (s.peekKw("ON")) None else s.identPart()
      require(s.kw("ON"), s"MERGE INTO $t: expected ON <condition>")
      val on = untilClause(s, "WHEN", "MATCHED", "NOT MATCHED")
      var clauses = Vector.empty[SqlMergeClause]
      while (s.kw("WHEN")) {
        if (s.kws("NOT", "MATCHED", "BY", "SOURCE")) {
          // Delta's full-sync tier: target rows NO source row matches
          val cond = if (s.kw("AND"))
            Some(untilClause(s, "THEN", "UPDATE", "DELETE")) else None
          require(s.kw("THEN"), s"MERGE INTO $t: expected THEN")
          if (s.kw("DELETE"))
            clauses :+= SqlMergeClause("delete_nmbs", cond, Nil, Nil)
          else if (s.kws("UPDATE", "SET")) {
            val sets = Scan.splitTop(
              untilClause(s, "WHEN", "MATCHED", "NOT MATCHED"), ',').map { a =>
              val (c, e) = Scan.splitAssign(a)
              (Scan.unquoteIdent(c), e)
            }
            require(sets.nonEmpty, s"MERGE INTO $t: empty UPDATE SET")
            clauses :+= SqlMergeClause("update_nmbs", cond,
              sets.map(_._1), sets.map(_._2))
          } else throw new IllegalArgumentException(
            s"MERGE INTO $t: WHEN NOT MATCHED BY SOURCE supports " +
              "UPDATE SET or DELETE")
        } else if (s.kws("NOT", "MATCHED")) {
          s.kws("BY", "TARGET") // optional Delta-ism, same meaning
          val cond = if (s.kw("AND"))
            Some(untilClause(s, "THEN", "INSERT")) else None
          require(s.kw("THEN"), s"MERGE INTO $t: expected THEN")
          require(s.kw("INSERT"), s"MERGE INTO $t: WHEN NOT MATCHED " +
            "supports INSERT only")
          if (s.punct('*'))
            clauses :+= SqlMergeClause("insert_star", cond, Nil, Nil)
          else {
            require(s.punct('('), s"MERGE INTO $t: expected (columns) " +
              "or * after INSERT")
            val cols = Scan.splitTop(s.parenBody(), ',')
              .map(Scan.unquoteIdent)
            require(s.kw("VALUES") && s.punct('('),
              s"MERGE INTO $t: expected VALUES (…) after INSERT (…)")
            val vals = Scan.splitTop(s.parenBody(), ',')
            require(cols.size == vals.size, s"MERGE INTO $t: INSERT has " +
              s"${cols.size} columns but ${vals.size} values")
            clauses :+= SqlMergeClause("insert", cond, cols, vals)
          }
        } else if (s.kw("MATCHED")) {
          val cond = if (s.kw("AND"))
            Some(untilClause(s, "THEN", "UPDATE", "DELETE")) else None
          require(s.kw("THEN"), s"MERGE INTO $t: expected THEN")
          if (s.kw("DELETE"))
            clauses :+= SqlMergeClause("delete", cond, Nil, Nil)
          else if (s.kws("UPDATE", "SET")) {
            if (s.punct('*'))
              clauses :+= SqlMergeClause("update_star", cond, Nil, Nil)
            else {
              val sets = Scan.splitTop(
                untilClause(s, "WHEN", "MATCHED", "NOT MATCHED"), ',').map { a =>
                val (c, e) = Scan.splitAssign(a)
                (Scan.unquoteIdent(c), e)
              }
              require(sets.nonEmpty, s"MERGE INTO $t: empty UPDATE SET")
              clauses :+= SqlMergeClause("update", cond,
                sets.map(_._1), sets.map(_._2))
            }
          } else throw new IllegalArgumentException(
            s"MERGE INTO $t: WHEN MATCHED supports UPDATE SET or DELETE")
        } else throw new IllegalArgumentException(
          s"MERGE INTO $t: expected MATCHED or NOT MATCHED after WHEN")
      }
      require(clauses.nonEmpty, s"MERGE INTO $t: no WHEN clauses")
      require(s.eof, s"unexpected trailing input in MERGE INTO $t")
      MergeIntoTxLogCommand(t, tAlias, srcTable, srcQuery, sAlias, on,
        clauses, evolve)
    }

  private def parseOptimize(s: Scan): Option[LogicalPlan] =
    target(s, allowIdent = true).map { t =>
      // Delta's `OPTIMIZE t FULL`: force the whole snapshot through the
      // rewrite (on a cluster-declared table, a complete re-cluster) —
      // the plain form is incremental there (see OptimizeTxLogCommand)
      val full = s.kw("FULL")
      val where = if (s.kw("WHERE")) Some(s.until("ZORDER")) else None
      val zorder =
        if (s.kws("ZORDER", "BY")) {
          require(s.punct('('), "OPTIMIZE: expected ZORDER BY (cols)")
          Scan.splitTop(s.parenBody(), ',').map(Scan.unquoteIdent)
        } else Seq.empty
      require(!full || (where.isEmpty && zorder.isEmpty),
        s"OPTIMIZE $t FULL does not combine with WHERE / ZORDER BY")
      require(s.eof, s"unexpected trailing input in OPTIMIZE $t")
      OptimizeTxLogCommand(t, where, zorder, full)
    }

  /** `VACUUM <t> [LITE] [RETAIN n VERSIONS | RETAIN n HOURS] [DRY RUN]`
    * — HOURS is Delta's time-window retention (lowered onto the commit
    * timestamp index); VERSIONS is the count form; LITE derives
    * candidates from the log's remove actions instead of a directory
    * walk (Delta 3.1). */
  private def parseVacuum(s: Scan): Option[LogicalPlan] = {
    target(s, allowIdent = true).map { t =>
      var retain: Option[Int] = None
      var hours: Option[Double] = None
      val lite = s.kw("LITE")
      if (s.kw("RETAIN")) {
        val n = s.word().getOrElse(
          throw new IllegalArgumentException(
            s"VACUUM $t: expected RETAIN <n> VERSIONS|HOURS"))
        if (s.kw("VERSIONS")) retain = Some(n.toInt)
        else if (s.kw("HOURS")) hours = Some(n.toDouble)
        else throw new IllegalArgumentException(
          s"VACUUM $t: expected VERSIONS or HOURS after RETAIN $n")
      }
      val dry = s.kws("DRY", "RUN")
      require(s.eof, s"unexpected trailing input in VACUUM $t")
      VacuumTxLogCommand(t, retain, dry, hours, lite)
    }
  }
}

/** Minimal quote/paren/comment-aware scanner over one SQL statement. */
private[graft] final class Scan(val sql: String) {
  private var i = 0
  def pos: Int = i
  def reset(p: Int): Unit = i = p

  private def isIdentChar(c: Char) =
    Character.isLetterOrDigit(c) || c == '_'

  def skipWs(): Unit = {
    var moved = true
    while (moved) {
      moved = false
      while (i < sql.length && Character.isWhitespace(sql.charAt(i))) {
        i += 1; moved = true
      }
      if (i + 1 < sql.length && sql.charAt(i) == '-' &&
          sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        moved = true
      } else if (i + 1 < sql.length && sql.charAt(i) == '/' &&
          sql.charAt(i + 1) == '*') {
        val e = sql.indexOf("*/", i + 2)
        i = if (e < 0) sql.length else e + 2
        moved = true
      }
    }
  }

  /** Case-insensitive keyword at a word boundary; consumes on match. */
  def kw(word: String): Boolean = {
    skipWs()
    if (sql.regionMatches(true, i, word, 0, word.length)) {
      val end = i + word.length
      if (end >= sql.length || !isIdentChar(sql.charAt(end))) {
        i = end; true
      } else false
    } else false
  }

  /** All keywords in sequence, atomically (no partial consumption). */
  def kws(words: String*): Boolean = {
    val p = i
    if (words.forall(kw)) true else { i = p; false }
  }

  def peekKw(word: String): Boolean = {
    val p = i
    val r = kw(word)
    i = p
    r
  }

  def punct(c: Char): Boolean = {
    skipWs()
    if (i < sql.length && sql.charAt(i) == c) { i += 1; true } else false
  }

  def backquoted(): Option[String] = {
    skipWs()
    if (i < sql.length && sql.charAt(i) == '`') {
      val sb = new StringBuilder; i += 1
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (c == '`') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '`') {
            sb.append('`'); i += 2
          } else { i += 1; return Some(sb.toString) }
        } else { sb.append(c); i += 1 }
      }
      None // unterminated
    } else None
  }

  def word(): Option[String] = {
    skipWs()
    val start = i
    while (i < sql.length && isIdentChar(sql.charAt(i))) i += 1
    if (i > start) Some(sql.substring(start, i)) else None
  }

  def identPart(): Option[String] = backquoted().orElse(word())

  /** A single-quoted 'literal' (backslash escapes), unquoted. */
  def quoted(): Option[String] = {
    skipWs()
    if (i < sql.length && sql.charAt(i) == '\'') {
      val sb = new StringBuilder; i += 1
      while (i < sql.length && sql.charAt(i) != '\'') {
        if (sql.charAt(i) == '\\' && i + 1 < sql.length) i += 1
        sb.append(sql.charAt(i)); i += 1
      }
      if (i < sql.length) { i += 1; Some(sb.toString) } else None
    } else None
  }

  /** Raw text from here until one of `stops` appears as a top-level
    * keyword (paren depth 0, outside quotes/backquotes/comments) or the
    * statement ends. Leaves the scanner AT the stop keyword; trims and
    * drops a trailing `;`. */
  def until(stops: String*): String = {
    skipWs()
    val start = i
    var depth = 0
    var end = -1
    while (i < sql.length && end < 0) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < sql.length && sql.charAt(i) != q) {
          if (sql.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '`') {
        i += 1
        while (i < sql.length && sql.charAt(i) != '`') i += 1
        i += 1
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && isIdentChar(c) &&
          (i == start || !isIdentChar(sql.charAt(i - 1)))) {
        val hit = stops.exists(st =>
          sql.regionMatches(true, i, st, 0, st.length) && {
            val e = i + st.length
            e >= sql.length || !isIdentChar(sql.charAt(e))
          })
        if (hit) end = i
        else { while (i < sql.length && isIdentChar(sql.charAt(i))) i += 1 }
      } else i += 1
    }
    val stop = if (end < 0) sql.length else end
    if (end >= 0) i = end
    sql.substring(start, stop).trim.stripSuffix(";").trim
  }

  /** Body of a parenthesized group whose `(` was ALREADY consumed; eats
    * through the matching `)`. */
  def parenBody(): String = {
    skipWs()
    val start = i
    var depth = 1
    while (i < sql.length && depth > 0) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < sql.length && sql.charAt(i) != q) {
          if (sql.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '`') {
        i += 1
        while (i < sql.length && sql.charAt(i) != '`') i += 1
        i += 1
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
    }
    require(depth == 0, "unbalanced parentheses")
    sql.substring(start, i - 1).trim
  }

  def eof: Boolean = {
    skipWs()
    i >= sql.length || sql.substring(i).forall(c =>
      c == ';' || Character.isWhitespace(c))
  }
}

private[graft] object Scan {

  /** Split on `sep` at paren depth 0, outside quotes/backquotes. */
  def splitTop(text: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < text.length && text.charAt(i) != q) {
          if (text.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '`') {
        i += 1
        while (i < text.length && text.charAt(i) != '`') i += 1
        i += 1
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == sep && depth == 0) {
          out += text.substring(start, i).trim
          start = i + 1
        }
        i += 1
      }
    }
    val last = text.substring(start).trim
    (out.result() :+ last).filter(_.nonEmpty)
  }

  /** `col = expr` → (col, expr); splits at the FIRST top-level `=` that
    * is not part of `==` / `<=` / `>=` / `!=` / `<>`. */
  def splitAssign(text: String): (String, String) = {
    var depth = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < text.length && text.charAt(i) != q) {
          if (text.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '`') {
        i += 1
        while (i < text.length && text.charAt(i) != '`') i += 1
        i += 1
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == '=' && depth == 0 &&
            (i == 0 || !"<>!=".contains(text.charAt(i - 1))) &&
            (i + 1 >= text.length || text.charAt(i + 1) != '=')) {
          return (text.substring(0, i).trim, text.substring(i + 1).trim)
        }
        i += 1
      }
    }
    throw new IllegalArgumentException(s"expected <column> = <expr>: $text")
  }

  /** Strip one level of backquotes from an identifier. */
  def unquoteIdent(s: String): String =
    if (s.length >= 2 && s.head == '`' && s.last == '`')
      s.substring(1, s.length - 1).replace("``", "`")
    else s

  /** Strip one level of backquotes OR single/double quotes (property
    * keys/values in TBLPROPERTIES lists arrive either way). */
  def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') ||
        (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else unquoteIdent(s)
}
