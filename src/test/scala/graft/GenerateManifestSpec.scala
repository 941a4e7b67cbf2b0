package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** `GENERATE symlink_format_manifest` (Delta's external-engine interop):
  * text manifests of absolute active-file paths under
  * `_symlink_format_manifest/`, one per partition directory. An engine
  * that understands none of the log (Presto/Trino/Athena/DuckDB) reads
  * the exact snapshot through them. Refusal contract: active DVs would
  * resurrect deleted rows in such a reader, so generation refuses and
  * names REORG APPLY (PURGE). */
class GenerateManifestSpec extends SparkSpec {
  import spark.implicits._

  private def manifestPaths(t: String): Seq[String] = {
    val root = Paths.get(t, "_symlink_format_manifest")
    TxLog.walkDir(root).filter(_.getFileName.toString == "manifest")
      .flatMap(p => new String(Files.readAllBytes(p)).split("\n"))
      .filter(_.nonEmpty)
  }

  test("unpartitioned: one manifest, externally readable, exact snapshot") {
    val t = tmpDir("genman") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    val rows = spark.sql(s"GENERATE symlink_format_manifest " +
      s"FOR TABLE txlog.`$t`").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("_symlink_format_manifest/manifest"))
    val paths = manifestPaths(t)
    assert(paths.forall(p => p.startsWith("/") && Files.exists(Paths.get(p))),
      s"manifest entries must be absolute, existing paths: $paths")
    // the external-reader contract: plain parquet over the listed paths
    // IS the snapshot, no log knowledge needed
    val external = spark.read.parquet(paths: _*)
    assert(external.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned: one manifest per partition dir; regeneration replaces") {
    val t = tmpDir("genman_part") + "/t"
    TxLog.setProperties(t, Map("graft.partition.columns" -> "p"))
    TxLog.append(Seq((1L, "x"), (2L, "y")).toDF("k", "p"), t)
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
    val root = Paths.get(t, "_symlink_format_manifest")
    val dirs = TxLog.listDir(root).filter(Files.isDirectory(_))
      .map(_.getFileName.toString).sorted
    assert(dirs === Seq("p=x", "p=y"),
      s"partitioned manifests must mirror the Hive layout, got $dirs")
    // overwrite drops p=y; regeneration must REPLACE the tree, not merge
    TxLog.overwrite(Seq((3L, "x")).toDF("k", "p"), t)
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
    val dirs2 = TxLog.listDir(root).filter(Files.isDirectory(_))
      .map(_.getFileName.toString).sorted
    assert(dirs2 === Seq("p=x"),
      "a dropped partition's manifest must disappear on regeneration")
    val external = spark.read.parquet(manifestPaths(t): _*)
    assert(external.as[Long].collect().toSeq === Seq(3L))
  }

  test("an empty snapshot writes one empty manifest, never a missing one") {
    val t = tmpDir("genman_empty") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
    TxLog.delete(spark, t, org.apache.spark.sql.functions.lit(true))
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
    val m = Paths.get(t, "_symlink_format_manifest", "manifest")
    assert(Files.exists(m),
      "an external reader must get zero rows, not file-not-found")
    // the delete's copy-on-write may leave one zero-row file or none at
    // all — either way the external contract is ZERO ROWS through the
    // manifest
    val paths = manifestPaths(t)
    if (paths.nonEmpty)
      assert(spark.read.parquet(paths: _*).count() === 0L)
    else assert(Files.size(m) === 0L)
  }

  test("graft.manifest.auto regenerates on every file-set change") {
    val t = tmpDir("genman_auto") + "/t"
    TxLog.setProperties(t, Map("graft.manifest.auto" -> "true"))
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val external1 = spark.read.parquet(manifestPaths(t): _*)
    assert(external1.as[(Long, String)].collect().toSet === Set((1L, "a")),
      "the append commit must have produced a manifest unprompted")
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    val external2 = spark.read.parquet(manifestPaths(t): _*)
    assert(external2.count() === 2,
      "the manifest must track the new commit with no operator action")
    // a DV commit leaves the manifest regeneration SKIPPED (stale but
    // never torn); the purge commit regenerates
    TxLog.deleteVectors(spark, t, col("k") === 1L)
    spark.sql(s"REORG TABLE txlog.`$t` APPLY (PURGE)")
    val external3 = spark.read.parquet(manifestPaths(t): _*)
    assert(external3.as[(Long, String)].collect().toSet === Set((2L, "b")),
      "the purge commit must regenerate the manifest")
  }

  test("active DVs refuse with the REORG PURGE remedy; purge unblocks") {
    val t = tmpDir("genman_dv") + "/t"
    TxLog.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    TxLog.deleteVectors(spark, t, col("k") === 2L)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
        .collect()
    }
    assert(e.getMessage.contains("REORG"),
      s"the refusal must name the remedy: ${e.getMessage}")
    spark.sql(s"REORG TABLE txlog.`$t` APPLY (PURGE)")
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE txlog.`$t`")
    val external = spark.read.parquet(manifestPaths(t): _*)
    assert(external.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (3L, "c")),
      "post-purge manifests must carry the DV-applied snapshot")
  }
}
