package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** `table_files` — the active-file inventory as a queryable metadata
  * table ([[graft.sql.TableFilesTvf]] over [[TxLog.tableFiles]]).
  * Everything must answer from the metadata plane (log fold + DV
  * sidecars); these specs pin content, not shape: recorded rows sum to
  * the table count, partitions label correctly, added_version tracks
  * commit history through compaction, has_dv flags exactly the DV'd
  * files, and the version argument snapshots. */
class TableFilesSpec extends SparkSpec {
  import spark.implicits._

  test("rows/sizes/partitions: recorded per-file metadata is exact") {
    val t = tmpDir("tf") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "p"), t)
    TxLog.append(Seq((4L, "y"), (5L, "z")).toDF("k", "p"), t)
    val df = spark.sql(s"SELECT * FROM table_files('$t')")
    assert(df.agg(sum("rows")).first().getLong(0) === 5L)
    assert(df.filter(col("size_bytes") <= 0).isEmpty)
    assert(df.filter(col("has_dv")).isEmpty)
    val perPart = df.groupBy("partition").agg(sum("rows").as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perPart === Map("p=x" -> 2L, "p=y" -> 2L, "p=z" -> 1L))
    // unpartitioned tables label every file <unpartitioned>
    val u = tmpDir("tf_u") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), u)
    assert(spark.sql(s"SELECT DISTINCT partition FROM table_files('$u')")
      .collect().map(_.getString(0)).toSeq === Seq("<unpartitioned>"))
  }

  test("added_version tracks history; optimize re-ages; version arg snapshots") {
    val t = tmpDir("tf_v") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)  // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v").coalesce(1), t)  // v2
    val byV = spark.sql(s"SELECT added_version, count(*) AS n FROM " +
      s"table_files('$t') GROUP BY 1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV === Map(1L -> 1L, 2L -> 1L))
    // the version argument answers the OLD snapshot
    assert(spark.sql(s"SELECT file FROM table_files('$t', 1)").count() === 1L)
    TxLog.optimize(spark, t, targetFiles = 1)                   // v3
    val after = spark.sql(s"SELECT added_version FROM table_files('$t')")
      .collect().map(_.getLong(0)).toSeq
    assert(after === Seq(3L), "compaction re-ages the surviving file")
  }

  test("has_dv flags exactly the files an active deletion vector covers") {
    val t = tmpDir("tf_dv") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    TxLog.deleteVectors(spark, t, col("k") === 1L)
    val flagged = spark.sql(
      s"SELECT rows, has_dv FROM table_files('$t') ORDER BY rows DESC")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // the 2-row file carries the DV (rows stays the footer upper bound);
    // the untouched 1-row file does not
    assert(flagged === Seq((2L, true), (1L, false)))
    // REORG PURGE materializes the delete → no DV'd file remains
    spark.sql(s"REORG TABLE txlog.`$t` APPLY (PURGE)")
    assert(spark.sql(s"SELECT * FROM table_files('$t')")
      .filter(col("has_dv")).isEmpty)
  }
}
