package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** `REORG TABLE … APPLY (PURGE)`: physically rewrite only the files
  * carrying DV-deleted rows or dropped-column bytes — logical contents
  * unchanged, soft-deleted bytes gone from disk. */
class ReorgPurgeSpec extends SparkSpec {
  import spark.implicits._

  test("materializes DV deletes: sidecars retire, bytes leave disk, contents unchanged") {
    val t = tmpDir("reorg") + "/t"
    TxLog.setProperties(t, Map("graft.deletionVectors.enabled" -> "true"))
    TxLog.append(spark.range(0, 100).toDF("k").coalesce(2), t)
    TxLog.deleteVectors(spark, t, col("k") < 10)
    assert(TxLog.activeDvs(t).nonEmpty)
    val before = TxLog.read(spark, t).as[Long].collect().toSet
    val v = spark.sql(s"REORG TABLE txlog.`$t` APPLY (PURGE)")
      .collect().head.getLong(0)
    assert(TxLog.activeDvs(t).isEmpty, "inert DV sidecars must retire")
    assert(TxLog.read(spark, t).as[Long].collect().toSet === before,
      "purge must not change logical contents")
    // physical purge: a raw scan of the active files holds no dead rows
    val raw = spark.read.parquet(
      TxLog.activeFiles(t).map(f => s"$t/$f"): _*)
    assert(raw.count() === 90)
    // second run finds nothing to do
    assert(TxLog.reorgPurge(spark, t).isEmpty)
    // time travel to the pre-reorg version still applies the DV
    assert(TxLog.read(spark, t, Some(v - 1)).count() === 90)
  }

  test("purges dropped-column bytes; post-drop files keep their paths") {
    val t = tmpDir("reorg") + "/drop"
    TxLog.append(Seq((1L, "a", "secret1"), (2L, "b", "secret2"))
      .toDF("k", "v", "s").coalesce(1), t)
    TxLog.enableColumnMapping(t)
    TxLog.dropColumn(t, "s")
    TxLog.append(Seq((3L, "c")).toDF("k", "v").coalesce(1), t)
    val f0 = TxLog.activeFiles(t)
    spark.sql(s"REORG TABLE txlog.`$t` APPLY (PURGE)")
    val f1 = TxLog.activeFiles(t)
    assert(f0.toSet.intersect(f1.toSet).size === 1,
      "only the pre-drop file rewrites; the clean file keeps its path")
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(f1.map(f => s"$t/$f"): _*)
    assert(!raw.columns.contains("s"),
      "dropped-column bytes must be physically gone")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxLog.reorgPurge(spark, t).isEmpty, "second run is a no-op")
  }

  test("partitioned table: only the DV'd partition's file rewrites, layout survives") {
    val t = tmpDir("reorg") + "/part"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p",
      "graft.deletionVectors.enabled" -> "true"))
    TxLog.append(Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"))
      .toDF("k", "v", "p").coalesce(1), t)
    TxLog.deleteVectors(spark, t, col("k") === 1L)
    val f0 = TxLog.activeFiles(t)
    assert(TxLog.reorgPurge(spark, t).nonEmpty)
    val f1 = TxLog.activeFiles(t)
    assert(f0.toSet.intersect(f1.toSet) === f0.filter(_.contains("p=y")).toSet,
      "the clean partition's file keeps its path")
    assert(f1.forall(f => f.contains("p=x") || f.contains("p=y")),
      "rewritten files keep the Hive partition layout")
    assert(TxLog.read(spark, t).select("k", "v", "p")
      .as[(Long, String, String)].collect().toSet ===
      Set((2L, "b", "x"), (3L, "c", "y")))
    assert(TxLog.activeDvs(t).isEmpty)
    // partition pruning still exact post-reorg
    assert(TxLog.read(spark, t).filter(col("p") === "x").count() === 1)
  }

  test("row ids and identity values survive a purge") {
    val t = tmpDir("reorg") + "/ident"
    TxLog.createTable(t, org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"))
    TxLog.declareIdentityColumn(t, "id")
    TxLog.setProperties(t, Map("graft.deletionVectors.enabled" -> "true"))
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v").coalesce(1).sortWithinPartitions("k"), t)
    TxLog.deleteVectors(spark, t, col("k") === 2L)
    val before = TxLog.read(spark, t).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(TxLog.reorgPurge(spark, t).nonEmpty)
    assert(TxLog.read(spark, t).select("k", "id").as[(Long, Long)]
      .collect().toMap === before,
      "identities must not move under the purge rewrite")
  }
}
