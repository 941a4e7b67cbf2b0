package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Row tracking (Delta's row IDs): a stable per-row identity — fresh
  * files read base + row_index (zero storage), rewrites materialize
  * surviving ids into a hidden physical column, so the id survives
  * UPDATE / DELETE / MERGE / CDC merge / OPTIMIZE. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): String = {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1), t)
    t
  }

  private def ids(t: String): Map[Long, Long] =
    TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap

  test("fresh appends get globally unique ids; plain reads never see them") {
    val t = seed()
    val m = ids(t)
    assert(m.keySet === Set(1L, 2L, 3L, 4L))
    assert(m.values.toSeq.distinct.size === 4, s"ids must be unique: $m")
    // the logical surface is untouched: no hidden column anywhere
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "v"))
    assert(TxLog.schemaAsOf(t).get.fieldNames.toSeq === Seq("k", "v"))
  }

  test("UPDATE preserves ids (rewrite materializes them into new files)") {
    val t = seed()
    val before = ids(t)
    spark.sql(s"UPDATE txlog.`$t` SET v = 'X' WHERE k <= 2")
    assert(ids(t) === before, "every id must survive the rewrite")
    // and the schema still has no hidden column
    assert(TxLog.read(spark, t).columns.toSeq === Seq("k", "v"))
  }

  test("DELETE keeps survivors' ids; deleted ids are never reused") {
    val t = seed()
    val before = ids(t)
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 1")
    assert(ids(t) === before - 1L)
    // a new append allocates ABOVE the high-water mark — the deleted
    // row's id cannot resurrect on an unrelated row
    TxLog.append(Seq((9L, "z")).toDF("k", "v").coalesce(1), t)
    val after = ids(t)
    assert(after(9L) > before.values.max)
    assert(!after.values.toSet.contains(before(1L)),
      "a deleted row's id must never reappear on another row")
    assert(after.values.toSeq.distinct.size === after.size)
  }

  test("OPTIMIZE compaction preserves every id") {
    val t = seed()
    val before = ids(t)
    assert(TxLog.optimizeSmall(spark, t,
      minFileSizeBytes = Long.MaxValue / 2, targetFiles = 1).nonEmpty)
    assert(ids(t) === before)
  }

  test("MERGE INTO: matched rows keep ids, inserted rows get fresh ones") {
    val t = seed()
    val before = ids(t)
    val src = Seq((2L, "B2"), (99L, "new")).toDF("k", "nv")
    TxLog.mergeInto(spark, t, src, "t", "s", expr("t.k = s.k"),
      matched = Seq(TxLog.MergeUpdate(None, Map("v" -> col("s.nv")))),
      notMatched = Seq(TxLog.MergeInsert(None,
        Map("k" -> col("s.k"), "v" -> col("s.nv")))))
    val after = ids(t)
    assert(after.view.filterKeys(before.contains).toMap === before,
      "matched + untouched rows keep their ids")
    assert(after(99L) > before.values.max, "inserted row takes a fresh id")
    assert(after.values.toSeq.distinct.size === after.size)
  }

  test("CDC merge: the id follows the key through an upsert") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("k", "v", "ver").coalesce(1), t)
    val before = ids3(t)
    TxLog.merge(spark, t, Seq((2L, "b2", 2L), (5L, "e", 2L))
      .toDF("k", "v", "ver"), Seq("k"), "ver")
    val after = ids3(t)
    assert(after(1L) === before(1L))
    assert(after(2L) === before(2L), "upserted key keeps its id")
    assert(after(5L) > before.values.max, "new key takes a fresh id")
  }

  private def ids3(t: String): Map[Long, Long] =
    TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap

  test("pre-enable files read NULL ids") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t) // before enable
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) // after
    val m = TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(m(1L).isEmpty, "pre-enable rows have no id")
    assert(m(2L).nonEmpty)
  }

  test("partitioned tables: ids resolve per group, survive UPDATE, refresh on overwrite") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "y"))
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a", 1995), (2L, "b", 1995), (3L, "c", 1996))
      .toDF("k", "v", "y"), t)
    val before = ids(t)
    assert(before.keySet === Set(1L, 2L, 3L))
    assert(before.values.toSeq.distinct.size === 3)
    // copy-on-write UPDATE inside a partition preserves ids
    spark.sql(s"UPDATE txlog.`$t` SET v = 'A' WHERE k = 1")
    assert(ids(t) === before)
    // a dynamic partition OVERWRITE replaces rows — replacement rows are
    // NEW rows and take fresh ids (this is not a rewrite of old rows)
    TxLog.overwritePartitions(
      Seq((9L, "z", 1996)).toDF("k", "v", "y"), t)
    val after = ids(t)
    assert(after.view.filterKeys(Set(1L, 2L)).toMap ===
      before.view.filterKeys(Set(1L, 2L)).toMap,
      "untouched partition keeps its ids")
    assert(after(9L) > before.values.max)
    assert(after.values.toSeq.distinct.size === after.size)
  }

  test("OPTIMIZE backfills ids for pre-enable rows (the documented remedy)") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.enableRowTracking(t)
    assert(TxLog.readWithRowIds(spark, t).filter(col("_row_id").isNull)
      .count() === 2, "pre-enable rows start with NULL ids")
    // the forced rewrite reads NULL materialized ids, so the rewritten
    // file's fresh base range covers the rows — ids appear, stay unique
    TxLog.optimizeSmall(spark, t, minFileSizeBytes = Long.MaxValue / 2)
    val m = ids(t)
    assert(m.keySet === Set(1L, 2L))
    assert(m.values.toSeq.distinct.size === 2)
    // and they are STABLE from here on: a later delete preserves them
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 1")
    assert(ids(t) === m - 1L)
  }

  test("a write supplying the reserved column refuses") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.enableRowTracking(t)
    val e = intercept[IllegalArgumentException](
      TxLog.append(Seq((1L, 5L)).toDF("k", "_graft_row_id"), t))
    assert(e.getMessage.contains("reserved"))
  }

  test("shallow clone carries ids; post-clone appends allocate above them") {
    val t = seed()
    spark.sql(s"UPDATE txlog.`$t` SET v = 'X' WHERE k = 1") // materialize
    val before = ids(t)
    val dst = tmpDir("rowtrack") + "/c"
    TxLog.cloneTable(spark, t, dst)
    assert(ids(dst) === before, "clone must see the source's ids")
    // a fresh allocation in the clone must start ABOVE the carried
    // ranges, not at zero (zero would collide with materialized ids)
    TxLog.append(Seq((7L, "g")).toDF("k", "v").coalesce(1), dst)
    val after = ids(dst)
    assert(after(7L) > before.values.max)
    assert(after.values.toSeq.distinct.size === after.size)
  }

  test("_row_version is the commit that last physically wrote the file") {
    val t = seed() // v1 enable, v2 append {1,2}, v3 append {3,4}
    def vers(): Map[Long, Long] =
      TxLog.readWithRowIds(spark, t).select("k", "_row_version")
        .as[(Long, Long)].collect().toMap
    assert(vers() === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
    // the rewrite bumps the version for BOTH rows of the touched file —
    // identity (_row_id) is stable, freshness (_row_version) is not
    spark.sql(s"UPDATE txlog.`$t` SET v = 'X' WHERE k = 1") // v4
    assert(vers() === Map(1L -> 4L, 2L -> 4L, 3L -> 3L, 4L -> 3L))
  }

  test("composes with column mapping: rename + UPDATE keep ids") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "v", "val") // metadata-only: no files touched
    val before = TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(before.values.toSeq.distinct.size === 2)
    spark.sql(s"UPDATE txlog.`$t` SET val = 'X' WHERE k = 1")
    val after = TxLog.readWithRowIds(spark, t)
    assert(after.columns.toSeq ===
      Seq("k", "val", "_row_id", "_row_version"))
    assert(after.select("k", "_row_id").as[(Long, Long)].collect().toMap
      === before, "ids survive a rewrite under the mapping")
  }

  test("composes with column mapping on a PARTITIONED table") {
    val t = tmpDir("rowtrack") + "/t2"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "v", "p").coalesce(1), t)
    TxLog.enableColumnMapping(t)
    TxLog.renameColumn(t, "p", "part") // partition column, metadata-only
    TxLog.renameColumn(t, "v", "val")
    val before = TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(before.values.toSeq.distinct.size === 2)
    // copy-on-write UPDATE inside one partition keeps both keys' ids
    spark.sql(s"UPDATE txlog.`$t` SET val = 'X' WHERE k = 1")
    val after = TxLog.readWithRowIds(spark, t)
    assert(after.columns.toSeq ===
      Seq("k", "val", "part", "_row_id", "_row_version"))
    assert(after.select("k", "_row_id").as[(Long, Long)].collect().toMap
      === before, "ids survive a partitioned rewrite under the mapping")
    // fresh appends to the renamed shape allocate new ids
    TxLog.append(Seq((3L, "c", 30L)).toDF("k", "val", "part"), t)
    val all = TxLog.readWithRowIds(spark, t).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(all.keySet === Set(1L, 2L, 3L))
    assert(all.values.toSeq.distinct.size === 3)
  }

  test("DV deletes keep survivors' ids without any rewrite") {
    val t = seed()
    TxLog.setProperties(t, Map("graft.deletionVectors.enabled" -> "true"))
    val before = ids(t)
    val filesBefore = TxLog.activeFiles(t).toSet
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 2") // data-less DV commit
    assert(TxLog.activeFiles(t).toSet === filesBefore, "no rewrite")
    assert(ids(t) === before - 2L)
  }

  test("changesWithRowIds: updates keep the id, deletes carry the retired one") {
    val t = seed() // v1 enable, v2+v3 appends
    val before = ids(t)
    spark.sql(s"UPDATE txlog.`$t` SET v = 'X' WHERE k = 1")   // v4
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 4")          // v5
    TxLog.append(Seq((8L, "h")).toDF("k", "v").coalesce(1), t) // v6
    val cdf = TxLog.changesWithRowIds(spark, t, Seq("k"), 3L, 6L)
      .select("k", "v", "_row_id", "change_type")
      .as[(Long, String, Long, String)].collect().toSet
    val byKey = cdf.map(r => r._1 -> r).toMap
    assert(byKey(1L) === ((1L, "X", before(1L), "update")),
      "the update rides the row's UNCHANGED id")
    assert(byKey(4L)._3 === before(4L), "the delete carries the retired id")
    assert(byKey(4L)._4 === "delete")
    assert(byKey(8L)._4 === "insert")
    assert(byKey(8L)._3 > before.values.max, "the insert has a fresh id")
    assert(cdf.size === 3, "untouched keys emit nothing")
  }

  test("a tracked table's CDC merge still refuses a batch missing a column") {
    val t = tmpDir("rowtrack") + "/t"
    TxLog.enableRowTracking(t)
    TxLog.append(Seq((1L, "a", 1L)).toDF("k", "v", "ver").coalesce(1), t)
    // the batch lacks 'v': enabling row tracking must NOT soften the
    // strict union into silent NULL-filling
    intercept[Exception](TxLog.merge(spark, t,
      Seq((1L, 2L)).toDF("k", "ver"), Seq("k"), "ver"))
    assert(TxLog.read(spark, t).count() === 1, "nothing committed")
  }

  test("ids survive a log checkpoint (compact folds from the full log)") {
    val t = seed()
    val before = ids(t)
    assert(TxLog.compact(t).nonEmpty)
    assert(ids(t) === before)
    TxLog.append(Seq((9L, "z")).toDF("k", "v").coalesce(1), t)
    val after = ids(t)
    assert(after(9L) > before.values.max,
      "post-checkpoint allocation still sees the full high-water fold")
  }

  test("time travel reads the ids as of that version") {
    val t = seed()
    spark.sql(s"DELETE FROM txlog.`$t` WHERE k = 2")
    // seed: v1 = enable (setProperty), v2/v3 = the two appends
    val historic = TxLog.readWithRowIds(spark, t, Some(3L))
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(historic.keySet === Set(1L, 2L, 3L, 4L))
    assert(historic === historic) // ids resolvable at the old snapshot
  }
}
