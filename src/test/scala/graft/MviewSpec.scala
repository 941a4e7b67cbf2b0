package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mview, TxLog}

/** Incremental materialized views ([[graft.ops.Mview]]).
  *
  * The load-bearing invariant everywhere: an INCREMENTAL refresh must
  * land the exact frame a from-scratch CREATE at the same source version
  * would — asserted by creating a fresh shadow view with the same query
  * after each mutation batch and comparing full row sets (visible AND
  * `__mv_*` maintenance columns). Strategy choice is asserted through
  * `Refresh.mode` plus the view log's own ops (a delta refresh must be
  * one `merge` commit, never an overwrite). */
class MviewSpec extends SparkSpec {
  import spark.implicits._

  /** 3 groups; w holds NULLs so COUNT/SUM/AVG null-handling is exercised
    * from the first refresh, not just in the corner test. */
  private def seed(t: String): Unit =
    TxLog.append(Seq(
      ("a", 10L, Some(1L)), ("a", 20L, Some(2L)), ("a", 30L, None),
      ("b", 5L, Some(7L)), ("b", 15L, None),
      ("c", 100L, Some(9L))).toDF("k", "v", "w"), t)

  private def assertMatchesFull(mv: String, query: String,
      dropCols: Seq[String] = Nil): Unit = {
    val shadow = tmpDir("mv_shadow") + "/mv"
    Mview.create(spark, shadow, query)
    def frame(t: String) =
      dropCols.foldLeft(TxLog.read(spark, t))(_ drop _)
    val got = frame(mv)
    val want = frame(shadow)
    assert(got.columns.toSeq === want.columns.toSeq)
    val order = got.columns.map(col).toSeq
    assert(got.orderBy(order: _*).collect().toSeq ===
      want.orderBy(order: _*).collect().toSeq)
  }

  test("rowDeltas: signed multiset delta is exact over mixed DML; layout ops emit nothing") {
    val t = tmpDir("mv_rd") + "/t"
    seed(t)                                                        // v1
    val v1 = TxLog.latestVersion(t).get
    TxLog.append(Seq(("d", 7L, Option.empty[Long])).toDF("k", "v", "w"), t) // v2
    TxLog.update(spark, t, col("k") === "c",
      Map("v" -> (col("v") + 1000L)))                              // v3
    TxLog.deleteVectors(spark, t, col("k") === "b" && col("v") === 5L) // v4 (DV)
    TxLog.optimize(spark, t, targetFiles = 1)                      // v5 layout
    val v5 = TxLog.latestVersion(t).get
    val d = TxLog.rowDeltas(spark, t, v1, v5)
    // net signed count per key == snapshot count diff per key
    val net = d.groupBy("k").agg(sum("_sign").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a cancels outright; c's in-place rewrite emits a ±pair netting 0
    assert(net.filterNot(_._2 == 0L) === Map("d" -> 1L, "b" -> -1L))
    // net signed SUM(v) == snapshot sum diff
    val dv = d.agg(sum(col("v") * col("_sign"))).first().getLong(0)
    val sumAt = (v: Long) =>
      TxLog.read(spark, t, Some(v)).agg(sum("v")).first().getLong(0)
    assert(dv === sumAt(v5) - sumAt(v1))
    // pure-layout window emits nothing at all
    assert(TxLog.rowDeltas(spark, t, v5 - 1, v5).isEmpty)
    // the SQL surface: table_deltas folds the same linear delta
    val viaSql = spark.sql(
      s"SELECT CAST(SUM(v * _sign) AS BIGINT) AS dv FROM table_deltas('$t', $v1)")
      .first().getLong(0)
    assert(viaSql === sumAt(v5) - sumAt(v1))
    // expired-window refusal parity with table_changes
    intercept[Exception] {
      spark.sql(s"SELECT * FROM table_deltas('$t', 999)").collect()
    }
  }

  test("delta tier: COUNT/SUM/AVG maintain through append, update, DV delete, group death and birth — one merge commit per refresh") {
    val t = tmpDir("mv_src") + "/t"
    seed(t)
    val query = s"SELECT k, count(*) AS n, sum(v) AS sv, count(w) AS cw, " +
      s"sum(w) AS sw, avg(v) AS av FROM txlog.`$t` WHERE v >= 0 GROUP BY k"
    val mv = tmpDir("mv_tgt") + "/mv"
    Mview.create(spark, mv, query)
    assertMatchesFull(mv, query)
    assert(TxLog.properties(mv)(Mview.VersionProp).toLong ===
      TxLog.latestVersion(t).get)

    // mutation batch: new group, update that MOVES a row across groups'
    // values, a DV delete, a full group death, and a layout rewrite
    TxLog.append(Seq(("d", 7L, Some(3L)), ("d", 8L, None))
      .toDF("k", "v", "w"), t)
    TxLog.update(spark, t, col("k") === "a" && col("v") === 10L,
      Map("v" -> lit(11L), "w" -> lit(5L).cast("long")))
    TxLog.deleteVectors(spark, t, col("k") === "b" && col("v") === 15L)
    TxLog.delete(spark, t, col("k") === "c") // group death
    TxLog.optimize(spark, t, targetFiles = 1)

    val r = Mview.refresh(spark, mv)
    assert(r.mode === "incremental_merge")
    assert(TxLog.commits(mv).last.op === "merge")
    // the cursor stamp rides the SAME commit (atomicity: crash between
    // data and stamp is unrepresentable)
    assert(TxLog.commits(mv).last.properties(Mview.VersionProp) ===
      Some(r.toVersion.toString))
    assertMatchesFull(mv, query)
    // group c actually died in the view
    assert(TxLog.read(spark, mv).filter(col("k") === "c").isEmpty)

    // noop refresh: no new commit
    val before = TxLog.latestVersion(mv).get
    assert(Mview.refresh(spark, mv).mode === "noop")
    assert(TxLog.latestVersion(mv).get === before)
  }

  test("delta tier: a group whose last non-null value leaves goes back to NULL (aux count, not stale sum)") {
    val t = tmpDir("mv_null") + "/t"
    TxLog.append(Seq(("a", 1L, Some(4L)), ("a", 2L, None),
      ("b", 3L, Some(6L))).toDF("k", "v", "w"), t)
    val query = s"SELECT k, sum(w) AS sw, avg(w) AS aw, count(*) AS n " +
      s"FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_null_tgt") + "/mv"
    Mview.create(spark, mv, query)
    // delete the ONLY non-null w of group a; the group itself survives
    TxLog.delete(spark, t, col("k") === "a" && col("v") === 1L)
    assert(Mview.refresh(spark, mv).mode === "incremental_merge")
    val row = TxLog.read(spark, mv).filter(col("k") === "a").first()
    assert(row.isNullAt(row.fieldIndex("sw")), "sum must return to NULL")
    assert(row.isNullAt(row.fieldIndex("aw")), "avg must return to NULL")
    assert(row.getLong(row.fieldIndex("n")) === 1L)
    assertMatchesFull(mv, query)
  }

  test("recompute tier: MIN/MAX views recompute exactly the touched groups") {
    val t = tmpDir("mv_mm") + "/t"
    seed(t)
    val query = s"SELECT k, max(v) AS mx, min(v) AS mn, count(*) AS n " +
      s"FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_mm_tgt") + "/mv"
    Mview.create(spark, mv, query)
    // delete group a's MAX row (the not-delta-maintainable direction),
    // kill group c outright, leave b untouched
    TxLog.delete(spark, t, col("k") === "a" && col("v") === 30L)
    TxLog.delete(spark, t, col("k") === "c")
    val r = Mview.refresh(spark, mv)
    assert(r.mode === "incremental_recompute")
    assert(TxLog.commits(mv).last.op === "merge")
    assertMatchesFull(mv, query)
    val a = TxLog.read(spark, mv).filter(col("k") === "a").first()
    assert(a.getLong(a.fieldIndex("mx")) === 20L)
    assert(TxLog.read(spark, mv).filter(col("k") === "c").isEmpty)
  }

  test("projection tier: append-only windows append; an upstream rewrite falls back to full") {
    val t = tmpDir("mv_proj") + "/t"
    seed(t)
    val query = s"SELECT k, v * 2 AS v2 FROM txlog.`$t` WHERE v < 1000"
    val mv = tmpDir("mv_proj_tgt") + "/mv"
    Mview.create(spark, mv, query)
    TxLog.append(Seq(("e", 50L, Option.empty[Long])).toDF("k", "v", "w"), t)
    val r1 = Mview.refresh(spark, mv)
    assert(r1.mode === "incremental_append")
    assert(TxLog.commits(mv).last.op === "append")
    assertMatchesFull(mv, query)
    TxLog.update(spark, t, col("k") === "e", Map("v" -> lit(60L)))
    val r2 = Mview.refresh(spark, mv)
    assert(r2.mode === "full_nonappend_delta")
    assertMatchesFull(mv, query)
    // a deleted row whose OLD image fails the view's WHERE is invisible
    // to the view: still an append-only window
    TxLog.append(Seq(("f", 5000L, Option.empty[Long])).toDF("k", "v", "w"), t)
    Mview.refresh(spark, mv)
    TxLog.delete(spark, t, col("k") === "f") // −1 row filtered by WHERE
    TxLog.append(Seq(("g", 1L, Option.empty[Long])).toDF("k", "v", "w"), t)
    val r3 = Mview.refresh(spark, mv)
    assert(r3.mode === "incremental_append")
    assertMatchesFull(mv, query)
  }

  test("global aggregate view: single row maintained through deletes") {
    val t = tmpDir("mv_glob") + "/t"
    seed(t)
    val query = s"SELECT count(*) AS n, sum(v) AS sv FROM txlog.`$t`"
    val mv = tmpDir("mv_glob_tgt") + "/mv"
    Mview.create(spark, mv, query)
    TxLog.delete(spark, t, col("k") === "a")
    TxLog.append(Seq(("z", 2L, Option.empty[Long])).toDF("k", "v", "w"), t)
    assert(Mview.refresh(spark, mv).mode === "incremental_merge")
    assert(TxLog.read(spark, mv).count() === 1L)
    assertMatchesFull(mv, query)
  }

  test("fallbacks: forced FULL, source schema change, expired window") {
    val t = tmpDir("mv_fb") + "/t"
    seed(t)
    val query = s"SELECT k, count(*) AS n FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_fb_tgt") + "/mv"
    Mview.create(spark, mv, query)

    TxLog.append(Seq(("a", 1L, Option.empty[Long])).toDF("k", "v", "w"), t)
    val rf = Mview.refresh(spark, mv, full = true)
    assert(rf.mode === "full_forced")
    assert(TxLog.commits(mv).last.op === "overwrite")
    assertMatchesFull(mv, query)

    // DDL change across the window → full (a rename would otherwise
    // silently null out the renamed column in the delta)
    TxLog.append(Seq(("b", 2L, Option.empty[Long])).toDF("k", "v", "w"), t)
    TxLog.addColumn(t, "extra", org.apache.spark.sql.types.LongType)
    assert(Mview.refresh(spark, mv).mode === "full_schema_changed")
    assertMatchesFull(mv, query)

    // expire the source log below the cursor → full (the fromV snapshot
    // no longer exists to delta against)
    (1 to 12).foreach(i => TxLog.append(
      Seq(("x", i.toLong, Option.empty[Long], Option.empty[Long]))
        .toDF("k", "v", "w", "extra"), t))
    val preExpiry = TxLog.properties(mv)(Mview.VersionProp).toLong
    TxLog.compact(t)
    assert(TxLog.expireLog(t).isDefined)
    assert(preExpiry < TxLog.retentionHorizon(t).get)
    val re = Mview.refresh(spark, mv)
    assert(re.mode === "full_expired_history")
    assertMatchesFull(mv, query)
  }

  test("SQL surface: CREATE/REFRESH MATERIALIZED VIEW, OR REPLACE, FULL") {
    val t = tmpDir("mv_sql") + "/t"
    seed(t)
    val mv = tmpDir("mv_sql_tgt") + "/mv"
    val query = s"SELECT k, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY k"
    spark.sql(s"CREATE MATERIALIZED VIEW txlog.`$mv` AS $query").collect()
    assertMatchesFull(mv, query)
    intercept[Exception] {
      spark.sql(s"CREATE MATERIALIZED VIEW txlog.`$mv` AS $query").collect()
    }
    TxLog.append(Seq(("q", 9L, Option.empty[Long])).toDF("k", "v", "w"), t)
    val r = spark.sql(s"REFRESH MATERIALIZED VIEW txlog.`$mv`").collect().head
    assert(r.getString(0) === "incremental_merge")
    assert(r.getLong(2) === TxLog.latestVersion(t).get)
    assertMatchesFull(mv, query)
    val rf = spark.sql(s"REFRESH MATERIALIZED VIEW txlog.`$mv` FULL")
      .collect().head
    assert(rf.getString(0) === "full_forced")
    // OR REPLACE swaps the definition in place (and retires the old
    // group-column stats declaration)
    val q2 = s"SELECT count(*) AS total FROM txlog.`$t`"
    spark.sql(s"CREATE OR REPLACE MATERIALIZED VIEW txlog.`$mv` AS $q2")
      .collect()
    assertMatchesFull(mv, q2)
    assert(TxLog.read(spark, mv).count() === 1L)
  }

  test("stream-static join tier: fact deltas join the dim snapshot; a dim change forces full recompute") {
    val root = tmpDir("mv_join")
    val (fact, dimT, mv) = (s"$root/fact", s"$root/dim", s"$root/mv")
    TxLog.append(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("ck", "amt"), fact)
    TxLog.append(Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"), (5L, "g3"))
      .toDF("ck", "seg"), dimT)
    val query = s"SELECT seg, count(*) AS n, sum(f.amt) AS amt " +
      s"FROM txlog.`$fact` f JOIN txlog.`$dimT` d ON f.ck = d.ck " +
      s"GROUP BY seg"
    Mview.create(spark, mv, query)
    assertMatchesFull(mv, query)
    // fact-only movement: incremental — new fact rows join the dim
    // snapshot with their sign; a fact row with NO dim partner is
    // invisible to the view on both paths
    TxLog.append(Seq((5L, 50L), (99L, 990L)).toDF("ck", "amt"), fact)
    TxLog.delete(spark, fact, col("ck") === 3L)
    val r1 = Mview.refresh(spark, mv)
    assert(r1.mode === "incremental_merge")
    assertMatchesFull(mv, query)
    val got = TxLog.read(spark, mv).orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("g1", 2L, 30L), ("g2", 1L, 40L), ("g3", 1L, 50L)))
    // dim movement: the fact delta can't express re-segmented partners
    TxLog.update(spark, dimT, col("ck") === 4L, Map("seg" -> lit("g3")))
    val r2 = Mview.refresh(spark, mv)
    assert(r2.mode === "full_dim_changed")
    assertMatchesFull(mv, query)
    // both sides caught up → noop
    assert(Mview.refresh(spark, mv).mode === "noop")
    // MIN/MAX over a join: touched-group recompute through the join
    val mm = s"$root/mm"
    val q2 = s"SELECT seg, max(f.amt) AS mx, count(*) AS n " +
      s"FROM txlog.`$fact` f JOIN txlog.`$dimT` d ON f.ck = d.ck GROUP BY seg"
    Mview.create(spark, mm, q2)
    TxLog.delete(spark, fact, col("ck") === 5L) // g3's max leaves
    val r3 = Mview.refresh(spark, mm)
    assert(r3.mode === "incremental_recompute")
    assertMatchesFull(mm, q2)
  }

  test("HLL tier: insert-only windows UNION sketches; deletes recompute touched groups; global+deletes goes full") {
    val t = tmpDir("mv_hll") + "/t"
    TxLog.append(Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L))
      .toDF("k", "u"), t)
    val query = s"SELECT k, approx_count_distinct(u) AS du, count(*) AS n " +
      s"FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_hll_tgt") + "/mv"
    Mview.create(spark, mv, query)
    // insert-only window: union path (one merge commit), estimates track
    // a from-scratch sketch exactly (register-max union)
    TxLog.append(Seq(("a", 2L), ("a", 3L), ("b", 8L), ("c", 9L))
      .toDF("k", "u"), t)
    val r1 = Mview.refresh(spark, mv)
    assert(r1.mode === "incremental_merge")
    assertMatchesFull(mv, query, dropCols = Seq("__mv_h_du"))
    val a = TxLog.read(spark, mv).filter(col("k") === "a").first()
    assert(a.getLong(a.fieldIndex("du")) === 3L)
    // a delete makes the window non-insert-only: sketches can't subtract,
    // so the touched groups recompute (still one merge commit)
    TxLog.delete(spark, t, col("k") === "a" && col("u") === 3L)
    val r2 = Mview.refresh(spark, mv)
    assert(r2.mode === "incremental_recompute")
    assertMatchesFull(mv, query, dropCols = Seq("__mv_h_du"))
    assert(TxLog.read(spark, mv).filter(col("k") === "a").first()
      .getLong(1) === 2L)
    // global sketch + deletes: nothing bounded to recompute → full
    val g = tmpDir("mv_hll_g") + "/mv"
    Mview.create(spark, g,
      s"SELECT approx_count_distinct(u) AS du FROM txlog.`$t`")
    TxLog.delete(spark, t, col("k") === "c")
    assert(Mview.refresh(spark, g).mode === "full_sketch_deletes")
    assertMatchesFull(g, s"SELECT approx_count_distinct(u) AS du FROM txlog.`$t`",
      dropCols = Seq("__mv_h_du"))
  }

  test("cross-feature: dynamic partition overwrite upstream refreshes incrementally; a column-mapping rename forces full") {
    val t = tmpDir("mv_xf") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 30L))
      .toDF("k", "p", "v"), t)
    val query = s"SELECT p, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY p"
    val mv = tmpDir("mv_xf_tgt") + "/mv"
    Mview.create(spark, mv, query)
    // backfill ONE partition: remove+add of exactly its files — the
    // delta window is that partition, the refresh a plain merge
    TxLog.overwritePartitions(
      Seq((9L, "x", 90L)).toDF("k", "p", "v"), t)
    val r = Mview.refresh(spark, mv)
    assert(r.mode === "incremental_merge")
    assertMatchesFull(mv, query)
    assert(TxLog.read(spark, mv).filter(col("p") === "x").first()
      .getLong(1) === 1L)
    // a rename under column mapping changes the logical shape — even of
    // a column the view NEVER references, the window's aligned delta
    // would misread it as drop+add, so the guard recomputes instead of
    // guessing (a rename of a referenced column fails resolution loudly
    // on either path — permanently broken until the view is redefined)
    TxLog.setProperties(t, Map("graft.columnMapping.mode" -> "name"))
    TxLog.append(Seq((4L, "y", 40L)).toDF("k", "p", "v"), t)
    TxLog.renameColumn(t, "k", "key") // unreferenced by the view
    val r2 = Mview.refresh(spark, mv)
    assert(r2.mode === "full_schema_changed")
    assertMatchesFull(mv, query)
  }

  test("view auto-compaction bounds the file count across many refreshes") {
    val t = tmpDir("mv_ac") + "/t"
    seed(t)
    val query = s"SELECT k, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_ac_tgt") + "/mv"
    Mview.create(spark, mv, query)
    TxLog.setProperties(mv, Map("graft.mview.compactThreshold" -> "4"))
    (1 to 8).foreach { i =>
      TxLog.append(Seq((s"k$i", i.toLong, Option.empty[Long]))
        .toDF("k", "v", "w"), t)
      assert(Mview.refresh(spark, mv).mode === "incremental_merge")
    }
    // without compaction each merge leaves ≥1 new file; the threshold
    // folds them (layout-only commit — rowDeltas consumers see nothing)
    assert(TxLog.activeFiles(mv).size <= 6,
      s"auto-compaction must bound the view's file count, " +
        s"got ${TxLog.activeFiles(mv).size}")
    assert(TxLog.commits(mv).exists(_.op == "optimize"))
    assertMatchesFull(mv, query)
  }

  test("racing refreshes cannot double-apply: the replay guard turns the loser into a noop") {
    val t = tmpDir("mv_race") + "/t"
    seed(t)
    val query = s"SELECT k, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY k"
    val mv = tmpDir("mv_race_tgt") + "/mv"
    Mview.create(spark, mv, query)
    TxLog.append(Seq(("a", 5L, Option.empty[Long])).toDF("k", "v", "w"), t)
    assert(Mview.refresh(spark, mv).mode === "incremental_merge")
    val applied = TxLog.read(spark, mv).orderBy("k").collect().toSeq
    // simulate the loser of a refresh race: rewind the cursor (what a
    // stale reader saw), refresh again — the merge commit claims the
    // same (stream, toVersion) the winner already holds, so the replay
    // guard refuses it at COMMIT time (not just at the pre-check) and
    // the refresh reports a concurrent noop instead of re-adding the
    // window's delta
    TxLog.setProperties(mv, Map(Mview.VersionProp -> "1"))
    val r = Mview.refresh(spark, mv)
    assert(r.mode === "noop_concurrent_refresh")
    assert(TxLog.read(spark, mv).orderBy("k").collect().toSeq === applied,
      "the racing refresh must not double-apply the window")
  }

  test("cascading views: an MV over an MV refreshes incrementally when the inner refresh was a merge") {
    val t = tmpDir("mv_casc") + "/t"
    seed(t)
    val mv1 = tmpDir("mv_casc1") + "/mv"
    val q1 = s"SELECT k, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY k"
    Mview.create(spark, mv1, q1)
    // the outer view aggregates the inner one — an MV is a txlog table,
    // so the whole machinery composes; the inner MERGE commit is an
    // ordinary remove+add window to the outer's rowDeltas
    val mv2 = tmpDir("mv_casc2") + "/mv"
    val q2 = s"SELECT count(*) AS groups, sum(sv) AS total FROM txlog.`$mv1`"
    Mview.create(spark, mv2, q2)
    TxLog.append(Seq(("d", 7L, Some(1L)), ("a", 1L, None))
      .toDF("k", "v", "w"), t)
    TxLog.delete(spark, t, col("k") === "c")
    assert(Mview.refresh(spark, mv1).mode === "incremental_merge")
    val r2 = Mview.refresh(spark, mv2)
    assert(r2.mode === "incremental_merge")
    assertMatchesFull(mv2, q2)
    val row = TxLog.read(spark, mv2).first()
    assert(row.getLong(row.fieldIndex("groups")) === 3L) // a, b, d
  }

  test("create refusals: DISTINCT, __mv_ alias, group/select mismatch, existing target; refresh refuses a non-view") {
    val t = tmpDir("mv_ref") + "/t"
    seed(t)
    def bad(q: String): Unit = intercept[IllegalArgumentException] {
      Mview.create(spark, tmpDir("mv_bad") + "/mv", q)
    }
    bad(s"SELECT k, count(DISTINCT v) AS n FROM txlog.`$t` GROUP BY k")
    bad(s"SELECT k, sum(v) AS __mv_x FROM txlog.`$t` GROUP BY k")
    bad(s"SELECT k, sum(v) AS sv FROM txlog.`$t` GROUP BY k, v")
    bad(s"SELECT k || 'x' AS kx, sum(v) AS sv FROM txlog.`$t` GROUP BY kx")
    val mv = tmpDir("mv_ref_tgt") + "/mv"
    Mview.create(spark, mv, s"SELECT k, count(*) AS n FROM txlog.`$t` GROUP BY k")
    intercept[IllegalArgumentException] {
      Mview.create(spark, mv, s"SELECT k, count(*) AS n FROM txlog.`$t` GROUP BY k")
    }
    intercept[IllegalArgumentException] { Mview.refresh(spark, t) }
  }
}
