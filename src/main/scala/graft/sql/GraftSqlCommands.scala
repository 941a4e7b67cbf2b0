package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, NumericType, TimestampType}

import graft.ops.TxLog

/** Target of a graft SQL DML statement: either an explicit table path
  * (`` txlog.`/path/to/t` `` — the Delta `delta.`path`` analog) or the
  * name of a catalog table created with `USING graft.sources.txlog`.
  * Resolution happens at RUN time (commands are built at parse time,
  * before any session catalog is consultable). */
final case class SqlTarget(path: Option[String], ident: Option[String]) {
  def resolve(spark: SparkSession): String = path.getOrElse {
    val ti = spark.sessionState.sqlParser.parseTableIdentifier(ident.get)
    val meta = spark.sessionState.catalog.getTableMetadata(ti)
    require(meta.provider.exists(_.equalsIgnoreCase("graft.sources.txlog")),
      s"${ident.get} is not a graft.sources.txlog table " +
        s"(provider=${meta.provider.getOrElse("none")})")
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri
        .map(u => java.nio.file.Paths.get(u).toString))
      .getOrElse(throw new IllegalArgumentException(
        s"txlog table ${ident.get} records no path"))
  }
  override def toString: String =
    path.map(p => s"txlog.`$p`").getOrElse(ident.getOrElse("?"))
}

/** One WHEN clause of a SQL MERGE, carried as raw expression text (the
  * command parses it against the live session at run time). `kind` is one
  * of update / update_star / delete / insert / insert_star. */
final case class SqlMergeClause(kind: String, cond: Option[String],
    cols: Seq[String], vals: Seq[String])

/** All graft DML commands report the committed txlog version. */
trait TxLogVersionCommand extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** `DELETE FROM txlog.`path` [WHERE cond]` → [[TxLog.delete]]
  * (copy-on-write of touched files) or, when the table declares
  * `graft.deletionVectors.enabled=true`, [[TxLog.deleteVectors]]
  * (data-less DV commit — Delta's `delta.enableDeletionVectors` split). */
final case class DeleteFromTxLogCommand(target: SqlTarget,
    where: Option[String]) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val cond = where.map(expr).getOrElse(lit(true))
    val useDvs = TxLog.properties(t)
      .get("graft.deletionVectors.enabled").contains("true")
    val v = if (useDvs) TxLog.deleteVectors(spark, t, cond)
            else TxLog.delete(spark, t, cond)
    Seq(Row(v))
  }
}

/** `UPDATE txlog.`path` SET c = e, … [WHERE cond]` → [[TxLog.update]]. */
final case class UpdateTxLogCommand(target: SqlTarget,
    sets: Seq[(String, String)], where: Option[String])
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val cond = where.map(expr).getOrElse(lit(true))
    // `SET c = DEFAULT` (the standard's explicit-default assignment):
    // the column's declared default, or NULL when none is declared —
    // the same resolution rule SQL INSERT applies to omitted columns.
    // Defaults are stored under the schema-canonical name, so the
    // lookup resolves the user-typed case first (SQL is
    // case-insensitive here).
    val props = TxLog.properties(t)
    val schema = TxLog.schemaAsOf(t)
    val canon: Map[String, org.apache.spark.sql.types.StructField] = schema
      .map(_.fields.map(f => f.name.toLowerCase -> f).toMap)
      .getOrElse(Map.empty)
    val v = TxLog.update(spark, t, cond,
      sets.map { case (c, e) =>
        if (e.trim.equalsIgnoreCase("DEFAULT")) {
          val f = canon.get(c.toLowerCase)
          val name = f.map(_.name).getOrElse(c)
          // cast to the DECLARED column type — the INSERT/MERGE backfill
          // rule; without it CASE/WHEN coercion against the old column
          // value could widen the frame's type (e.g. DATE+STRING→STRING)
          // and commit files whose physical type contradicts the logged
          // schema
          val raw = props.get(s"graft.default.$name").map(expr)
            .getOrElse(lit(null))
          c -> f.map(ff => raw.cast(ff.dataType)).getOrElse(raw)
        } else c -> expr(e)
      }.toMap)
    Seq(Row(v))
  }
}

/** `INSERT INTO/OVERWRITE txlog.`path`` → [[TxLog.append]] /
  * [[TxLog.overwrite]] / [[TxLog.overwritePartitions]] /
  * [[TxLog.replaceWhere]]. The query text is parsed by the live session
  * (`spark.sql`), then aligned to the table's schema: an explicit column
  * list maps the query's output positionally onto the NAMED columns
  * (remaining target columns land NULL — Spark/Delta's by-name INSERT);
  * without one the query must match the full target arity (minus static
  * partition constants) and maps positionally. Every column is cast to
  * the target field type, so an INSERT can never commit a file whose
  * parquet types diverge from the table schema. A static `PARTITION
  * (c = v)` adds the constant; a dynamic mention `PARTITION (c)` just
  * asserts the column is declared — both route to the dynamic
  * partition-overwrite commit (with constants, dynamic ≡ static). */
final case class InsertIntoTxLogCommand(target: SqlTarget,
    overwrite: Boolean, partition: Seq[(String, Option[String])],
    cols: Seq[String], replaceWhere: Option[String], queryText: String)
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    // the parser carries `(SELECT …)` verbatim; Spark's statement
    // grammar wants the bare query
    val q0 = queryText.trim
    val q = if (q0.startsWith("(") && q0.endsWith(")"))
      q0.substring(1, q0.length - 1) else q0
    val src = spark.sql(q)
    val tgtSchema = TxLog.schemaAsOf(t)
    if (tgtSchema.isEmpty) { // first write creates the table
      require(cols.isEmpty && replaceWhere.isEmpty,
        s"INSERT into empty/nonexistent txlog table $t supports only " +
          "the plain positional form (no column list / REPLACE WHERE — " +
          "there is no schema to align against yet)")
      val withStatics = partition.collect { case (c, Some(v)) => (c, v) }
        .foldLeft(src) { case (d, (c, v)) => d.withColumn(c, expr(v)) }
      return Seq(Row(TxLog.append(withStatics, t)))
    }
    val schema = tgtSchema.get
    def field(name: String) = schema.fields
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"INSERT into $t: column $name is not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    val statics = partition.collect { case (c, Some(v)) => field(c).name -> v }
    partition.foreach { case (c, _) => field(c) } // dynamic mentions exist
    // positional→named alignment; GENERATED ALWAYS columns (expression
    // AND identity forms) are not part of the positional arity (the
    // write path computes/allocates them) — expression columns may be
    // supplied explicitly via a column list to override; identity never
    val gen0 = (TxLog.generatedCols(t).keySet ++
      TxLog.identityCols(t).keySet).map(_.toLowerCase)
    val named: Seq[String] =
      if (cols.nonEmpty) cols.map(c => field(c).name)
      else schema.fieldNames.toSeq.filterNot(statics.map(_._1).contains)
        .filterNot(f => gen0.contains(f.toLowerCase))
    require(src.columns.length == named.length,
      s"INSERT into $t: query produces ${src.columns.length} columns " +
        s"but the insert expects ${named.length} " +
        s"(${named.mkString(", ")})")
    val bound = src.toDF(named: _*)
    val withStatics = statics.foldLeft(bound) { case (d, (c, v)) =>
      d.withColumn(c, expr(v))
    }
    val provided = withStatics.columns.map(_.toLowerCase).toSet
    // target order, target types; unnamed columns backfill their declared
    // DEFAULT (graft.default.<col>, the Delta column-defaults behavior)
    // or NULL — except GENERATED ALWAYS columns (expression and identity),
    // which stay absent so the write path computes/allocates them (a NULL
    // backfill would fail the expression equality check)
    val generated = (TxLog.generatedCols(t).keySet ++
      TxLog.identityCols(t).keySet).map(_.toLowerCase)
    val defaults = TxLog.properties(t).collect {
      case (k, e) if k.startsWith("graft.default.") =>
        k.stripPrefix("graft.default.").toLowerCase -> e
    }
    val aligned = withStatics.select(schema.fields.toSeq
      .filter(f => provided.contains(f.name.toLowerCase) ||
        !generated.contains(f.name.toLowerCase))
      .map { f =>
        (if (provided.contains(f.name.toLowerCase)) col(f.name)
         else defaults.get(f.name.toLowerCase).map(expr)
           .getOrElse(lit(null))).cast(f.dataType).alias(f.name)
      }: _*)
    val v = replaceWhere match {
      case Some(cond) => TxLog.replaceWhere(spark, t, aligned, expr(cond))
      case None if overwrite && partition.nonEmpty &&
          partition.forall(_._2.isDefined) =>
        // FULLY-static spec = Hive/Delta static-partition overwrite: the
        // named partition clears UNCONDITIONALLY (a zero-row source
        // empties it). overwritePartitions would instead keep existing
        // files when the source produces no tuple for the partition —
        // dynamic semantics, wrong here. replaceWhere on the static
        // constants expresses the unconditional clear in one commit.
        TxLog.replaceWhere(spark, t, aligned,
          statics.map { case (c, ve) => col(c) === expr(ve) }
            .reduce(_ && _))
      case None if overwrite && partition.nonEmpty =>
        TxLog.overwritePartitions(aligned, t)
      case None if overwrite => TxLog.overwrite(aligned, t)
      case None => TxLog.append(aligned, t)
    }
    Seq(Row(v))
  }
}

/** `COPY INTO <t> FROM '<dir>' …` → [[TxLog.copyInto]]: idempotent bulk
  * file ingestion. Reports the committed version and how many source
  * files this run actually loaded (0 on an idempotent re-run). */
final case class CopyIntoTxLogCommand(target: SqlTarget, source: String,
    format: String, options: Map[String, String], force: Boolean,
    pattern: Option[String] = None, mergeSchema: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val (v, n) = TxLog.copyInto(spark, t, source, format, options, force,
      pattern, mergeSchema)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v, n))
  }
}

/** `MERGE INTO txlog.`path` [AS] t USING src [AS] s ON … WHEN …` →
  * [[TxLog.mergeInto]]. `UPDATE SET *` / `INSERT *` expand by name over
  * the target columns the source also carries (Delta's star expansion);
  * aliases default to `t` (target) and the source table name. */
final case class MergeIntoTxLogCommand(target: SqlTarget,
    targetAlias: Option[String], sourceTable: Option[String],
    sourceQuery: Option[String], sourceAlias: Option[String],
    on: String, clauses: Seq[SqlMergeClause],
    evolve: Boolean = false) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val src = sourceQuery.map(spark.sql).getOrElse(
      spark.table(sourceTable.getOrElse(throw new IllegalArgumentException(
        "MERGE INTO needs USING <table> or USING (<query>)"))))
    val ta = targetAlias.getOrElse("t")
    val sa = sourceAlias.orElse(sourceTable).getOrElse("s")
    val tgtSchema = TxLog.schemaAsOf(t)
      .getOrElse(TxLog.read(spark, t).schema)
    val srcCols = src.columns.toSet
    // GENERATED ALWAYS AS IDENTITY: never writable — explicit SET/INSERT
    // mentions refuse, and star expansion silently skips the column
    // (Delta's rule); inserted rows read fresh commit-allocated values,
    // updated rows keep theirs (materialized row ids)
    val idents = TxLog.identityCols(t).keys.map(_.toLowerCase).toSet
    val explicitIdent = clauses.flatMap(_.cols)
      .filter(c => idents.contains(c.toLowerCase))
    require(explicitIdent.isEmpty,
      s"MERGE INTO $t: column(s) ${explicitIdent.mkString(", ")} are " +
        "GENERATED ALWAYS AS IDENTITY — their values are allocated by " +
        "the commit; remove them from the UPDATE SET / INSERT lists")
    // star expansion: shared columns — or, under WITH SCHEMA EVOLUTION,
    // EVERY source column (the new ones widen the table)
    def starSet: Map[String, Column] =
      (if (evolve) src.columns.toSeq
       else tgtSchema.fieldNames.toSeq.filter(srcCols.contains))
        .filterNot(c => idents.contains(c.toLowerCase))
        .map(c => c -> col(s"$sa.$c")).toMap
    val matched: Seq[TxLog.MergeAction] = clauses.collect {
      case SqlMergeClause("update_star", c, _, _) =>
        TxLog.MergeUpdate(c.map(expr), starSet)
      case SqlMergeClause("update", c, cols, vals) =>
        TxLog.MergeUpdate(c.map(expr), cols.zip(vals.map(expr)).toMap)
      case SqlMergeClause("delete", c, _, _) =>
        TxLog.MergeDelete(c.map(expr))
    }
    val notMatched: Seq[TxLog.MergeInsert] = clauses.collect {
      case SqlMergeClause("insert_star", c, _, _) =>
        TxLog.MergeInsert(c.map(expr), starSet)
      case SqlMergeClause("insert", c, cols, vals) =>
        TxLog.MergeInsert(c.map(expr), cols.zip(vals.map(expr)).toMap)
    }
    val notMatchedBySource: Seq[TxLog.MergeAction] = clauses.collect {
      case SqlMergeClause("update_nmbs", c, cols, vals) =>
        TxLog.MergeUpdate(c.map(expr), cols.zip(vals.map(expr)).toMap)
      case SqlMergeClause("delete_nmbs", c, _, _) =>
        TxLog.MergeDelete(c.map(expr))
    }
    Seq(Row(TxLog.mergeInto(spark, t, src, ta, sa, expr(on),
      matched, notMatched, onKeys = equiKeys(spark, on, ta, sa),
      mergeSchema = evolve, notMatchedBySource = notMatchedBySource)))
  }

  /** Target↔source equi-join pairs from the ON condition's conjuncts
    * (`t.k = s.k AND …`) — the pruning hint that lets mergeInto search
    * touched files through stats/bloom skipping instead of a full-table
    * semi-join. Only alias-qualified attribute=attribute conjuncts
    * qualify; anything else contributes nothing (sound: the hint only
    * narrows candidates, the join still decides). */
  private def equiKeys(spark: SparkSession, on: String,
      ta: String, sa: String): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    def walk(e: Expression): Seq[(String, String)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        (a.nameParts, b.nameParts) match {
          case (Seq(qa, ca), Seq(qb, cb)) if qa.equalsIgnoreCase(ta) &&
            qb.equalsIgnoreCase(sa) => Seq(ca -> cb)
          case (Seq(qa, ca), Seq(qb, cb)) if qa.equalsIgnoreCase(sa) &&
            qb.equalsIgnoreCase(ta) => Seq(cb -> ca)
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    try walk(spark.sessionState.sqlParser.parseExpression(on))
    catch { case _: Exception => Seq.empty }
  }
}

/** `OPTIMIZE <t> [WHERE part = v [AND …]] [ZORDER BY (a[, b])]`.
  *
  * Without WHERE: bin-packing compaction of sub-threshold files
  * ([[TxLog.optimizeSmall]]; threshold/target from
  * `spark.graft.optimize.minFileBytes` / `.targetFileBytes`, defaults
  * 128 MiB / 1 GiB) — or, with ZORDER, a full-snapshot re-cluster.
  * With WHERE (a conjunction of partition-column equalities / IS NULL):
  * partition-scoped [[TxLog.optimizeWhere]], the form that compacts
  * yesterday's partition of a 100 TB table without touching the rest.
  *
  * ZORDER BY computes a Morton key over grid cells derived from each
  * column's observed min/max (numeric / date / timestamp columns), range
  * repartitions + sorts by it, so every output file covers a tight box in
  * BOTH dimensions and the re-recorded stats prune range queries on
  * either (the Delta `ZORDER BY` contract). One column degrades to a
  * plain range cluster. */
final case class OptimizeTxLogCommand(target: SqlTarget,
    where: Option[String], zorder: Seq[String], full: Boolean = false)
  extends TxLogVersionCommand {

  private def gridCell(c: Column, mn: Double, mx: Double,
      bits: Int): Column = {
    val cells = (1 << bits) - 1
    if (!(mx > mn)) lit(0L)
    else least(lit(cells.toLong), greatest(lit(0L),
      (((c.cast("double") - lit(mn)) / lit(mx - mn)) * lit(cells))
        .cast("long")))
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val conf = spark.conf
    val minBytes = conf.getOption("spark.graft.optimize.minFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val targetBytes = conf.getOption("spark.graft.optimize.targetFileBytes")
      .map(_.toLong).getOrElse(1024L * 1024 * 1024)
    val cluster: Seq[Column] = zorder match {
      case Seq() => Seq.empty
      case cols =>
        val schema = TxLog.schemaAsOf(t)
          .getOrElse(TxLog.read(spark, t).schema)
        val numeric = cols.map { c =>
          val f = schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"ZORDER BY column $c is not a column of $target"))
          f.dataType match {
            case _: NumericType => col(c).cast("double")
            case DateType => unix_date(col(c)).cast("double")
            case TimestampType => unix_micros(col(c)).cast("double")
            case dt => throw new IllegalArgumentException(
              s"ZORDER BY needs a numeric/date/timestamp column; $c is $dt")
          }
        }
        if (cols.size == 1) numeric // single column: plain range cluster
        else if (cols.size == 2) {
          // one metadata-cheap pass for the grid bounds (min/max only)
          val b = TxLog.read(spark, t).agg(
            min(numeric.head), max(numeric.head),
            min(numeric(1)), max(numeric(1))).head()
          def d(i: Int) = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
          Seq(graft.functions.ZOrder.interleave2(
            gridCell(numeric.head, d(0), d(1), 16),
            gridCell(numeric(1), d(2), d(3), 16)))
        } else throw new IllegalArgumentException(
          "ZORDER BY supports 1 or 2 columns (the Morton interleave is " +
            "2-D; compose hilbert_key manually for more dimensions)")
    }
    val declaredCluster = TxLog.properties(t).get("graft.cluster.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val v = where match {
      case Some(w) =>
        TxLog.optimizeWhere(spark, t, PartitionPredicate.parse(spark, w),
          targetBytes = Some(targetBytes), clusterBy = cluster)
      case None if zorder.isEmpty && !full && declaredCluster.nonEmpty =>
        // liquid-clustering maintenance: plain OPTIMIZE on a
        // cluster-declared table is INCREMENTAL — only files written
        // since the last OPTIMIZE (plus small outputs) rewrite; an
        // immediate re-run is a no-op. `OPTIMIZE t FULL` re-clusters
        // the whole snapshot.
        TxLog.optimizeIncremental(spark, t, minBytes,
          targetBytes = Some(targetBytes))
      case None =>
        val threshold =
          if (zorder.nonEmpty || full) Long.MaxValue else minBytes
        val clusterEff =
          if (cluster.nonEmpty) cluster
          else if (full) declaredCluster.map(col(_))
          else Seq.empty
        TxLog.optimizeSmall(spark, t, threshold,
          targetBytes = Some(targetBytes), clusterBy = clusterEff)
    }
    Seq(Row(v.orElse(TxLog.latestVersion(t)).getOrElse(0L)))
  }
}

/** WHERE clause of a partition-scoped OPTIMIZE: a conjunction of
  * `col = literal` / `col IS NULL` over partition columns, parsed with
  * the session's expression parser and folded to the partition tuple
  * [[TxLog.optimizeWhere]] takes. */
object PartitionPredicate {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, IsNull, Literal}

  def parse(spark: SparkSession, text: String): Map[String, Any] =
    fold(spark.sessionState.sqlParser.parseExpression(text))

  private def fold(e: Expression): Map[String, Any] = e match {
    case And(l, r) => fold(l) ++ fold(r)
    case EqualTo(a: UnresolvedAttribute, Literal(v, _)) => Map(a.name -> un(v))
    case EqualTo(Literal(v, _), a: UnresolvedAttribute) => Map(a.name -> un(v))
    case IsNull(a: UnresolvedAttribute) => Map(a.name -> null)
    case other => throw new IllegalArgumentException(
      "OPTIMIZE … WHERE must be a conjunction of <partition col> = " +
        s"<literal> / <partition col> IS NULL; got: ${other.sql}")
  }

  private def un(v: Any): Any = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case x => x
  }
}

/** `DESCRIBE HISTORY <t>` → [[TxLog.history]]: one row per commit
  * (version, op, batch id, add/remove/DV counts, bytes, timestamp). */
final case class DescribeHistoryTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("batch_id", LongType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("n_added_dvs", LongType, nullable = false)(),
    AttributeReference("added_bytes", LongType, nullable = false)(),
    AttributeReference("ts", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.history(spark, target.resolve(spark)).collect().toSeq
}

/** `SHOW PARTITIONS txlog.`p`` → [[TxLog.partitions]]: the snapshot's
  * distinct partition tuples with file counts and bytes — metadata-plane
  * only, like the Delta/Hive verb. */
final case class ShowPartitionsTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.partitions(target.resolve(spark)).map { case (tuple, n, bytes) =>
      val s = tuple.toSeq.sortBy(_._1).map { case (k, v) =>
        s"$k=${v.getOrElse("__HIVE_DEFAULT_PARTITION__")}"
      }.mkString("/")
      Row(if (s.isEmpty) "<unpartitioned>" else s, n.toLong, bytes)
    }
}

/** `ALTER TABLE txlog.`p` ALTER COLUMN c SET DEFAULT <expr> | DROP
  * DEFAULT` — Delta's column defaults: a SQL INSERT that OMITS the
  * column (column-list form) fills the default instead of NULL.
  * Existing rows and positional full-arity inserts are untouched, and
  * DataFrame writes keep their explicit-columns contract — the same
  * write-time-only scope Delta gives the feature. The expression must
  * be self-contained (no column references — it is evaluated per
  * inserted row with nothing to bind against). Stored as a
  * `graft.default.<col>` property: one commit, versioned, visible in
  * SHOW TBLPROPERTIES. */
final case class AlterColumnDefaultCommand(target: SqlTarget,
    colName: String, default: Option[String]) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val schema = TxLog.schemaAsOf(t).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER COLUMN on $t: the table has no schema yet"))
    val f = schema.fields.find(_.name.equalsIgnoreCase(colName)).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER COLUMN: $colName is not a column of $t " +
          s"(${schema.fieldNames.mkString(", ")})"))
    val v = default match {
      case Some(e) =>
        val parsed = spark.sessionState.sqlParser.parseExpression(e)
        val refs = parsed.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a
        }
        require(refs.isEmpty,
          s"DEFAULT for $colName must be self-contained; it references " +
            s"${refs.map(_.name).mkString(", ")}")
        // evaluability + castability proven NOW, not at first insert
        spark.range(1).select(expr(e).cast(f.dataType)).collect()
        TxLog.setProperties(t, Map(s"graft.default.${f.name}" -> e))
      case None =>
        TxLog.unsetProperties(t, Seq(s"graft.default.${f.name}"))
    }
    Seq(Row(v))
  }
}

/** `ANALYZE TABLE txlog.`p` COMPUTE STATISTICS [NOSCAN | FOR COLUMNS …
  * | FOR ALL COLUMNS]` — Spark's catalog-statistics verb for PATH
  * tables the session catalog can't hold stats for. Table stats
  * (row count exact, bytes from the log) and per-column stats (NDV via
  * HLL approx — the Spark/Delta production choice at scale — plus exact
  * null count and min/max) persist as `graft.analyze.*` properties in
  * ONE commit, so they version/time-travel with the table and any
  * engine or operator reads them through SHOW TBLPROPERTIES. NOSCAN
  * records the metadata-derived table stats only (no data pass), same
  * contract as stock ANALYZE. The scan is ONE aggregate pass over the
  * snapshot regardless of column count. */
final case class AnalyzeTxLogCommand(target: SqlTarget, cols: Seq[String],
    allCols: Boolean, noscan: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("stat", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("value", org.apache.spark.sql.types.StringType,
      nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val sizeBytes = TxLog.fileSizes(t).values.sum
    val stats = scala.collection.mutable.LinkedHashMap[String, String](
      "graft.analyze.sizeBytes" -> sizeBytes.toString)
    if (!noscan) {
      val snap = TxLog.read(spark, t)
      val wanted =
        if (allCols)
          // stock ANALYZE's FOR ALL COLUMNS rule: silently skip column
          // types min/max can't order (maps, structs, arrays) instead of
          // failing the whole command on one of them; explicitly named
          // columns still surface the analyzer's own error
          snap.schema.fields.toSeq.filter(f =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType)).map(_.name)
        else {
          val missing = cols.filterNot(snap.columns.contains)
          require(missing.isEmpty,
            s"ANALYZE TABLE $t: no such column(s): ${missing.mkString(", ")}")
          cols
        }
      // one aggregate pass computes everything: exact row count, and per
      // column approx NDV (HLL, rsd 0.05), exact null count, min/max
      val aggs = count(lit(1)).as("__rc") +: wanted.flatMap(c => Seq(
        approx_count_distinct(col(c)).as(s"__ndv_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
      val r = snap.agg(aggs.head, aggs.tail: _*).collect()(0)
      stats += "graft.analyze.rowCount" -> r.getAs[Long]("__rc").toString
      wanted.foreach { c =>
        stats += s"graft.analyze.col.$c.ndv" ->
          r.getAs[Long](s"__ndv_$c").toString
        stats += s"graft.analyze.col.$c.nullCount" ->
          r.getAs[Long](s"__nulls_$c").toString
        Option(r.getAs[String](s"__min_$c")).foreach(v =>
          stats += s"graft.analyze.col.$c.min" -> v)
        Option(r.getAs[String](s"__max_$c")).foreach(v =>
          stats += s"graft.analyze.col.$c.max" -> v)
      }
      // EQUI-WIDTH HISTOGRAMS (opt-in: graft.analyze.histogramBuckets=N):
      // per numeric analyzed column, bucket counts over [min, max] with
      // bucket = clamp(floor((v - lo) * N / (hi - lo)), 0, N - 1) — a
      // deterministic IEEE formula any engine reproduces EXACTLY (no
      // quantile sketch), which is what lets the oracle recompute it.
      // One groupBy per column (histograms are a second pass in stock
      // Spark ANALYZE too); selectivity estimation reads them as
      // `graft.analyze.col.<c>.hist` = "lo,hi|c0,c1,…".
      val nBuckets = TxLog.properties(t)
        .get("graft.analyze.histogramBuckets")
        .flatMap(_.trim.toIntOption).getOrElse(0)
      if (nBuckets > 0) {
        val numericCols = wanted.filter(c => snap.schema(c).dataType
          .isInstanceOf[NumericType])
        numericCols.foreach { c =>
          val lo = stats.get(s"graft.analyze.col.$c.min").map(_.toDouble)
          val hi = stats.get(s"graft.analyze.col.$c.max").map(_.toDouble)
          for (l <- lo; h <- hi; if h > l) {
            val bucket = least(lit(nBuckets - 1), greatest(lit(0),
              floor((col(c).cast("double") - lit(l)) * lit(nBuckets) /
                lit(h - l)))).cast("int")
            val counts = snap.filter(col(c).isNotNull)
              .groupBy(bucket.as("__b")).count()
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            val vec = (0 until nBuckets)
              .map(counts.getOrElse(_, 0L)).mkString(",")
            stats += s"graft.analyze.col.$c.hist" -> s"$l,$h|$vec"
          }
        }
      }
    }
    TxLog.setProperties(t, stats.toMap)
    stats.toSeq.map { case (k, v) => Row(k, v) }
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE txlog.`p`` — Delta's
  * manifest generation: text files of absolute data-file paths so
  * external engines (Presto/Trino/Athena/DuckDB) read the snapshot
  * without understanding the log. Refuses on active DVs (an external
  * reader would resurrect the deleted rows); remedy REORG APPLY (PURGE)
  * is named in the error. See [[TxLog.generateManifest]]. */
final case class GenerateManifestCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifest", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.generateManifest(target.resolve(spark))
      .map { case (m, n) => Row(m, n) }
}

/** `DESCRIBE txlog.`path`` — the logged schema as (col_name, data_type,
  * comment): generated/identity declarations surface in the comment,
  * and the standard `# Partition Information` section follows for
  * partitioned tables (what `DESCRIBE delta.`/p`` shows). Metadata-only:
  * one cached log fold, no file is opened. */
final case class DescribeTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("data_type", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("comment", org.apache.spark.sql.types.StringType,
      nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val schema = TxLog.schemaAsOf(t).getOrElse(TxLog.read(spark, t).schema)
    val parts = TxLog.declaredPartitionCols(t)
    val gens = TxLog.generatedCols(t)
    val idents = TxLog.identityCols(t)
    val cols = schema.fields.toSeq.map { f =>
      val note = idents.get(f.name)
        .map { case (st, sp) =>
          s"GENERATED ALWAYS AS IDENTITY (START WITH $st INCREMENT BY $sp)" }
        .orElse(gens.get(f.name).map(e => s"GENERATED ALWAYS AS ($e)"))
      Row(f.name, f.dataType.simpleString, note.orNull)
    }
    val partRows =
      if (parts.isEmpty) Seq.empty
      else Seq(Row("# Partition Information", "", null),
        Row("# col_name", "data_type", null)) ++
        parts.map { c =>
          val dt = schema.fields.find(_.name == c)
            .map(_.dataType.simpleString).getOrElse("")
          Row(c, dt, null)
        }
    cols ++ partRows
  }
}

/** `SHOW TBLPROPERTIES txlog.`path`` → the folded table-property map
  * (path form only: the stock verb serves catalog tables). */
final case class ShowTxLogPropertiesCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("value", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.properties(target.resolve(spark)).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `REORG TABLE <t> APPLY (PURGE)` → [[TxLog.reorgPurge]]: rewrite the
  * files still carrying DV-deleted rows or dropped-column bytes. No-op
  * (current version) when nothing needs purging. */
final case class ReorgTxLogCommand(target: SqlTarget)
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val v = TxLog.reorgPurge(spark, t)
      .getOrElse(TxLog.latestVersion(t).getOrElse(0L))
    Seq(Row(v))
  }
}

/** `SHOW CREATE TABLE txlog.`p``: reconstructs the column-list CREATE
  * DDL from the log — schema, NOT NULL (the `<col>_not_null` CHECK
  * sugar renders back inline), GENERATED / IDENTITY declarations,
  * CHECK constraints, PARTITIONED BY, TBLPROPERTIES. Round-trips: the
  * emitted statement re-creates an equivalent table definition at a new
  * path. */
final case class ShowCreateTableTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt",
      org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val schema = TxLog.schemaAsOf(t).getOrElse(
      throw new IllegalArgumentException(
        s"txlog table $t has no logged schema"))
    val gen = TxLog.generatedCols(t)
    val idents = TxLog.identityCols(t)
    val checks = TxLog.constraints(t)
    val partCols = TxLog.declaredPartitionCols(t)
    // NOT NULL sugar: a `<col>_not_null` CHECK of exactly `c IS NOT
    // NULL` renders back inline on its column, not as a CONSTRAINT line
    val notNullOf = schema.fieldNames.filter(c =>
      checks.get(s"${c}_not_null")
        .exists(_.equalsIgnoreCase(s"$c IS NOT NULL"))).toSet
    val colLines = schema.fields.map { f =>
      val nn = if (notNullOf(f.name)) " NOT NULL" else ""
      val ident = idents.get(f.name).map { case (st, sp) =>
        s" GENERATED ALWAYS AS IDENTITY (START WITH $st INCREMENT BY $sp)"
      }.getOrElse("")
      val genc = gen.get(f.name)
        .map(e => s" GENERATED ALWAYS AS ($e)").getOrElse("")
      s"  `${f.name}` ${f.dataType.sql}$nn$ident$genc"
    }
    val checkLines = checks.toSeq.sortBy(_._1).collect {
      case (n, e) if !notNullOf.exists(c => n == s"${c}_not_null") =>
        s"  CONSTRAINT $n CHECK ($e)"
    }
    val shownProps = (TxLog.properties(t) - "graft.partition.columns")
      .filterNot { case (k, _) => k.startsWith("graft.generated.") ||
        k.startsWith("graft.identity.") }
    val sb = new StringBuilder
    sb.append(s"CREATE TABLE txlog.`$t` (\n")
    sb.append((colLines ++ checkLines).mkString(",\n"))
    sb.append("\n) USING txlog")
    if (partCols.nonEmpty)
      sb.append(s"\nPARTITIONED BY (${partCols.mkString(", ")})")
    if (shownProps.nonEmpty)
      sb.append("\nTBLPROPERTIES (" + shownProps.toSeq.sorted
        .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ") + ")")
    Seq(Row(sb.toString))
  }
}

/** `DESCRIBE DETAIL <t>` → [[TxLog.detail]]: one summary row. */
final case class DescribeDetailTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = {
    val S = org.apache.spark.sql.types.StringType
    Seq(AttributeReference("format", S, nullable = false)(),
      AttributeReference("location", S, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("partition_columns", S, nullable = false)(),
      AttributeReference("n_properties", LongType, nullable = false)(),
      AttributeReference("protocol", LongType, nullable = false)(),
      AttributeReference("last_commit_ts", LongType, nullable = false)(),
      AttributeReference("earliest_version", LongType, nullable = false)())
  }
  override def run(spark: SparkSession): Seq[Row] =
    TxLog.detail(spark, target.resolve(spark)).collect().toSeq
}

/** `FSCK REPAIR TABLE <t> [DRY RUN]` → [[TxLog.fsck]]: one row per
  * missing data file; without DRY RUN the references are dropped in one
  * repair commit. */
final case class FsckTxLogCommand(target: SqlTarget, dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("missing_file",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("repaired",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val missing = TxLog.fsck(spark, t, dryRun)
    if (!dryRun) spark.sessionState.catalog.invalidateAllCachedTables()
    missing.map(f => Row(f, !dryRun))
  }
}

/** Shared timestamp-literal handling for the `TIMESTAMP AS OF` verbs:
  * epoch millis, 'yyyy-MM-dd HH:mm:ss', or a date-only 'yyyy-MM-dd'
  * (midnight) — a bare ISO date is all digits and dashes, so a naive
  * digits-check would toLong-crash on it. */
private[graft] object SqlTimestamps {
  def toMillis(ts: String): Long =
    if (ts.forall(_.isDigit) || (ts.startsWith("-") &&
        ts.drop(1).forall(_.isDigit))) ts.toLong
    else if (ts.matches("""\d{4}-\d{2}-\d{2}"""))
      java.sql.Timestamp.valueOf(ts + " 00:00:00").getTime
    else java.sql.Timestamp.valueOf(ts).getTime

  /** Latest version of `table` committed at or before `ts`. */
  def versionAt(table: String, ts: String, what: String): Long =
    TxLog.commits(table).filter(_.ts <= toMillis(ts)).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"$what: no commit at or before timestamp $ts")).version
}

/** `RESTORE [TABLE] <t> TO VERSION AS OF n` /
  * `TO TIMESTAMP AS OF <millis|'yyyy-MM-dd HH:mm:ss'>` →
  * [[TxLog.restore]] (one forward commit re-points the snapshot). */
final case class RestoreTxLogCommand(target: SqlTarget,
    version: Option[Long], timestamp: Option[String])
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val toV = version.getOrElse(
      SqlTimestamps.versionAt(t, timestamp.get, s"RESTORE $target"))
    Seq(Row(TxLog.restore(spark, t, toV)))
  }
}

/** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] txlog.`p`
  * [PARTITIONED BY (c, …)] [TBLPROPERTIES ('k' = 'v', …)] AS <query>`
  * — CTAS for path tables: declared layout/properties commit first (so
  * the data write sees them), then the query result lands via
  * [[TxLog.append]] (fresh table) or [[TxLog.overwrite]] (OR REPLACE —
  * schema, layout and properties all reset to the declared ones; prior
  * versions stay time-travelable). */
/** Column-list `CREATE TABLE txlog.`p` (…)` — Delta's full-schema DDL
  * form, the natural home of identity columns. `NOT NULL` lands as an
  * enforced CHECK constraint (`<col>_not_null`, validated by every write
  * path — the same machinery as user CHECKs); GENERATED / IDENTITY
  * declarations and PARTITIONED BY ride the create commit's properties,
  * so the whole definition (minus constraints, which are one commit
  * each) is ONE atomic commit. REPLACE resets properties AND
  * constraints to the declared set; identity high-water marks survive a
  * REPLACE by design (ids are never reused, so re-created rows cannot
  * mint values an earlier incarnation handed out). */
final case class CreateTableTxLogCommand(target: SqlTarget,
    cols: Seq[(String, String)], notNull: Seq[String],
    generated: Seq[(String, String)],
    identities: Seq[(String, Long, Long)], checks: Seq[(String, String)],
    partitionCols: Seq[String], props: Map[String, String],
    orReplace: Boolean, ifNotExists: Boolean) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.types.{DataType, StructField, StructType}
    val t = target.resolve(spark)
    val existing = TxLog.latestVersion(t)
    if (existing.nonEmpty && ifNotExists) return Seq(Row(existing.get))
    require(existing.isEmpty || orReplace,
      s"txlog table $t already exists — use CREATE OR REPLACE TABLE " +
        "to replace it")
    identities.foreach { case (n, _, step) =>
      require(step != 0,
        s"CREATE TABLE $t: identity column $n: INCREMENT BY must be " +
          "non-zero") }
    val schema = StructType(cols.map { case (n, ty) =>
      StructField(n, DataType.fromDDL(ty), nullable = true) })
    val colNames = schema.fieldNames.map(_.toLowerCase).toSet
    partitionCols.foreach(c => require(colNames.contains(c.toLowerCase),
      s"CREATE TABLE $t: PARTITIONED BY column '$c' is not in the " +
        "column list"))
    val declared = props ++
      (if (partitionCols.nonEmpty)
        Map("graft.partition.columns" -> partitionCols.mkString(","))
      else Map.empty[String, String]) ++
      generated.map { case (n, e) => s"graft.generated.$n" -> e }.toMap ++
      identities.map { case (n, st, sp) =>
        s"graft.identity.$n" -> s"$st,$sp" }.toMap ++
      (if (identities.nonEmpty) Map("graft.rowTracking.enabled" -> "true")
      else Map.empty[String, String])
    if (existing.nonEmpty) {
      // REPLACE: retire the WHOLE outgoing definition (properties and
      // constraints) before the data-clearing overwrite — an old
      // generated/identity declaration left active would inject or
      // strip columns from the empty write — then declare the new set
      val old = TxLog.properties(t).keySet
      if (old.nonEmpty) TxLog.unsetProperties(t, old.toSeq)
      TxLog.constraints(t).keys.foreach(TxLog.dropConstraint(t, _))
      TxLog.overwrite(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema), t, mergeSchema = true)
      if (declared.nonEmpty) TxLog.setProperties(t, declared)
    } else {
      TxLog.createTable(t, schema, declared)
    }
    val allChecks = checks ++
      notNull.map(c => s"${c}_not_null" -> s"$c IS NOT NULL")
    allChecks.foreach { case (n, e) => TxLog.addConstraint(spark, t, n, e) }
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(TxLog.latestVersion(t).get))
  }
}

final case class CtasTxLogCommand(target: SqlTarget, queryText: String,
    orReplace: Boolean, ifNotExists: Boolean,
    partitionCols: Seq[String], props: Map[String, String])
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val existing = TxLog.latestVersion(t)
    if (existing.nonEmpty && ifNotExists) return Seq(Row(existing.get))
    require(existing.isEmpty || orReplace,
      s"txlog table $t already exists — use CREATE OR REPLACE TABLE " +
        "to replace it")
    val q0 = queryText.trim
    val q = if (q0.startsWith("(") && q0.endsWith(")"))
      q0.substring(1, q0.length - 1) else q0
    val df = spark.sql(q)
    val declared = (if (partitionCols.nonEmpty)
      Map("graft.partition.columns" -> partitionCols.mkString(","))
    else Map.empty[String, String]) ++ props
    if (existing.nonEmpty) {
      // REPLACE resets the table's configuration to the declared set
      val stale = TxLog.properties(t).keySet -- declared.keySet
      if (stale.nonEmpty) TxLog.unsetProperties(t, stale.toSeq)
    }
    // the partition declaration validates against the INCOMING query's
    // schema (on REPLACE the current schema is the outgoing table's)
    if (partitionCols.nonEmpty)
      TxLog.alterPartitioning(t, partitionCols, Some(df.schema))
    if (props.nonEmpty) TxLog.setProperties(t, props)
    val v = if (existing.nonEmpty) TxLog.overwrite(df, t, mergeSchema = true)
            else TxLog.append(df, t)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] txlog.`dst`
  * [SHALLOW|DEEP] CLONE <src> [VERSION|TIMESTAMP AS OF …]` →
  * [[TxLog.cloneTable]] (shallow: metadata-only file references) /
  * [[TxLog.cloneTableDeep]] (independent copy). Bare CLONE = DEEP,
  * the Databricks default. */
final case class CloneTxLogCommand(target: SqlTarget, source: SqlTarget,
    deep: Boolean, orReplace: Boolean, ifNotExists: Boolean,
    version: Option[Long], timestamp: Option[String])
  extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dst = target.resolve(spark)
    val src = source.resolve(spark)
    val existing = TxLog.latestVersion(dst)
    if (existing.nonEmpty && ifNotExists) return Seq(Row(existing.get))
    val asOf = version.orElse(timestamp.map(
      SqlTimestamps.versionAt(src, _, s"CLONE $source")))
    val v =
      if (deep) TxLog.cloneTableDeep(spark, src, dst, asOf,
        replace = orReplace)
      else TxLog.cloneTable(spark, src, dst, asOf, replace = orReplace)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `ALTER TABLE txlog.`p` SET TBLPROPERTIES (k=v, …)` /
  * `UNSET TBLPROPERTIES (k, …)` / `ADD CONSTRAINT name CHECK (expr)` —
  * the Delta table-configuration verbs over the txlog property/
  * constraint commits. */
final case class AlterTxLogTableCommand(target: SqlTarget,
    set: Seq[(String, String)], unset: Seq[String],
    constraint: Option[(String, String)],
    dropConstraint: Option[String] = None) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val v = (constraint, dropConstraint) match {
      case (Some((name, check)), _) =>
        TxLog.addConstraint(spark, t, name, check)
      case (None, Some(name)) => TxLog.dropConstraint(t, name)
      case _ if set.nonEmpty => TxLog.setProperties(t, set.toMap)
      case _ => TxLog.unsetProperties(t, unset)
    }
    Seq(Row(v))
  }
}

/** `SHOW COLUMNS {IN|FROM} txlog.`path`` — the logged schema's column
  * names (path form only; the stock verb serves catalog tables). */
final case class ShowColumnsTxLogCommand(target: SqlTarget)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    TxLog.schemaAsOf(t).getOrElse(TxLog.read(spark, t).schema)
      .fieldNames.toSeq.map(Row(_))
  }
}

/** `ALTER TABLE txlog.`p` CLUSTER BY (col, …) | NONE` — Delta's liquid
  * clustering declaration: sets/retires `graft.cluster.columns`, the
  * property every subsequent unpartitioned write range-clusters by
  * (and implicitly stats-records). Metadata-only; existing files
  * re-cluster at the next OPTIMIZE. */
final case class AlterClusterByTxLogCommand(target: SqlTarget,
    cols: Seq[String]) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    TxLog.schemaAsOf(t).foreach { s =>
      val missing = cols.filterNot(c =>
        s.fieldNames.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"ALTER TABLE $t CLUSTER BY: column(s) ${missing.mkString(", ")} " +
          s"not in the table schema (${s.fieldNames.mkString(", ")})")
    }
    val v =
      if (cols.isEmpty) TxLog.unsetProperties(t, Seq("graft.cluster.columns"))
      else TxLog.setProperties(t,
        Map("graft.cluster.columns" -> cols.mkString(",")))
    Seq(Row(v))
  }
}

/** `ALTER TABLE txlog.`p` SET PARTITIONED BY (col, …)` — partition spec
  * evolution ([[TxLog.alterPartitioning]]): one metadata commit, zero
  * data rewritten; `()` unpartitions. */
final case class AlterPartitioningTxLogCommand(target: SqlTarget,
    cols: Seq[String]) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.alterPartitioning(target.resolve(spark), cols)))
}

/** Column-level ALTER TABLE verbs. RENAME/DROP COLUMN are metadata-only
  * and require column mapping (enable with
  * `ALTER TABLE t SET TBLPROPERTIES ('graft.columnMapping.mode'='name')`
  * — [[TxLog.enableColumnMapping]]); ADD COLUMN(S) is the plain
  * schema-evolution commit and works on any txlog table. The column
  * type text is parsed by the LIVE session's parser at run time — one
  * type grammar, Spark's own (the expression-carry pattern every graft
  * DML command uses). */
sealed trait ColumnAction
final case class RenameColumnAction(from: String, to: String)
    extends ColumnAction
final case class DropColumnAction(name: String) extends ColumnAction
final case class AddColumnsAction(cols: Seq[(String, String)],
    generated: Option[(String, String)] = None) extends ColumnAction
final case class IdentityColumnAction(name: String, start: Long,
    step: Long) extends ColumnAction
final case class WidenColumnAction(name: String,
    typeDdl: String) extends ColumnAction

final case class AlterColumnTxLogCommand(target: SqlTarget,
    action: ColumnAction) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val v = action match {
      case RenameColumnAction(from, to) => TxLog.renameColumn(t, from, to)
      case DropColumnAction(name) => TxLog.dropColumn(t, name)
      case AddColumnsAction(cols, generated) =>
        val added = cols.map { case (n, ty) =>
          TxLog.addColumn(t, n,
            spark.sessionState.sqlParser.parseDataType(ty))
        }.last
        generated.map { case (n, e) =>
          TxLog.declareGeneratedColumn(spark, t, n, e)
        }.getOrElse(added)
      case IdentityColumnAction(n, start, step) =>
        TxLog.declareIdentityColumn(t, n, start, step)
      case WidenColumnAction(n, ty) =>
        TxLog.widenColumnType(spark, t, n,
          org.apache.spark.sql.types.DataType.fromDDL(ty))
    }
    // cached relations pin their schema at resolution — a rename/drop
    // must not keep serving the old shape to later queries
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `CONVERT TO TXLOG parquet.`/dir` [PARTITIONED BY (c, …)]` →
  * [[TxLog.convertParquet]]: in-place, zero-copy (hard-linked)
  * conversion of an existing parquet directory. */
final case class ConvertToTxLogCommand(dir: String,
    partitionCols: Seq[String]) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.convertParquet(spark, dir, partitionCols)))
}

/** `VACUUM <t> [RETAIN n VERSIONS | RETAIN n HOURS] [DRY RUN]` →
  * [[TxLog.vacuum]]; reports the number of files removed (or that WOULD
  * be removed under DRY RUN). The table's declared
  * `graft.vacuum.retainVersions` floor still caps how aggressive a SQL
  * caller can be; the HOURS form additionally keeps every version
  * inside the time window (commit-timestamp index). */
final case class VacuumTxLogCommand(target: SqlTarget, retain: Option[Int],
    dryRun: Boolean, retainHours: Option[Double] = None,
    lite: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("removed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    Seq(Row(TxLog.vacuum(t, retain.getOrElse(2), dryRun = dryRun,
      retainHours = retainHours, lite = lite).size.toLong))
  }
}

/** `CREATE [OR REPLACE] MATERIALIZED VIEW txlog.`/p` AS <query>` →
  * [[graft.ops.Mview.create]]: full compute at the source head; the
  * definition and source-version cursor ride the create commit. */
final case class CreateMviewCommand(target: SqlTarget, query: String,
    orReplace: Boolean) extends TxLogVersionCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.ops.Mview.create(spark, target.resolve(spark), query,
      orReplace)))
}

/** `REFRESH MATERIALIZED VIEW <t> [FULL]` → [[graft.ops.Mview.refresh]]:
  * reports the strategy taken (incremental_merge /
  * incremental_recompute / incremental_append / full_* / noop) and the
  * source window folded in. */
final case class RefreshMviewCommand(target: SqlTarget, full: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("mode", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)(),
    AttributeReference("view_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = graft.ops.Mview.refresh(spark, target.resolve(spark), full)
    Seq(Row(r.mode, r.fromVersion, r.toVersion, r.viewVersion))
  }
}
