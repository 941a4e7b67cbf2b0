package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Bloom-index data skipping (the Delta bloom-filter-index analog).
  * Min/max stats prune range reads on CLUSTERED columns; they prune
  * nothing for a point lookup on a hash-scattered high-cardinality key —
  * every file's [min, max] spans the whole domain. These specs pin the
  * soundness contract (no false negative can ever drop a row; files
  * without filters always survive) and the maintenance lifecycle
  * (rewrites carry the index forward, retired sidecars vacuum away).
  * All assertions are DETERMINISTIC: xxhash64 and the filter sizing are
  * fixed, so the false-positive pattern is identical on every run. */
class TxLogBloomSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = tmpDir("txbloom") + "/t"

  /** Three single-file appends whose key sets INTERLEAVE (i mod 3), so
    * every file's [min, max] covers the whole key domain — range stats
    * are useless by construction and only the blooms can prune. */
  private def scattered(t: String, bloom: Boolean): Unit = {
    (0 until 3).foreach { m =>
      val part = (0 until 900).filter(_ % 3 == m)
        .map(i => (f"user-$i%04d", i.toLong, s"v$i"))
        .toDF("k", "ver", "v").coalesce(1)
      TxLog.append(part, t, statsCols = Seq("k"),
        bloomCols = if (bloom) Seq("k") else Seq.empty)
    }
  }

  test("point lookup: exact result, and blooms prune what stats cannot") {
    val t = table()
    scattered(t, bloom = true)
    val all = TxLog.read(spark, t)
    val expected = all.filter(col("k") === "user-0500")
      .as[(String, Long, String)].collect().toSet
    assert(expected.nonEmpty)
    val got = TxLog.readEquals(spark, t, "k", Seq("user-0500"))
      .as[(String, Long, String)].collect().toSet
    assert(got === expected)
    // every file's string bounds span the domain -> sstats admit all 3;
    // the bloom index cuts the scan below that
    val pruned = TxLog.filesForEquals(spark, t, "k", Seq("user-0500"))
    assert(TxLog.activeFiles(t).size === 3)
    assert(pruned.size < 3, s"blooms pruned nothing: $pruned")
    // multi-value probe unions the files of both keys (different i mod 3)
    val two = TxLog.readEquals(spark, t, "k", Seq("user-0500", "user-0501"))
      .as[(String, Long, String)].collect().toSet
    assert(two === all.filter(col("k").isin("user-0500", "user-0501"))
      .as[(String, Long, String)].collect().toSet)
  }

  test("no false negatives across the whole key space; absent key reads empty") {
    val t = table()
    scattered(t, bloom = true)
    // probe EVERY present key through the pruned path in one read — any
    // false negative (a wrongly-pruned file) would lose rows here
    val keys = (0 until 900).map(i => f"user-$i%04d")
    val got = TxLog.readEquals(spark, t, "k", keys).count()
    assert(got === 900L)
    assert(TxLog.readEquals(spark, t, "k", Seq("user-9999")).count() === 0L)
  }

  test("null keys in a bloom-indexed column neither crash nor leak") {
    val t = table()
    TxLog.append(Seq((Option("a"), 1L), (Option.empty[String], 2L))
      .toDF("k", "ver"), t, bloomCols = Seq("k"))
    assert(TxLog.readEquals(spark, t, "k", Seq("a"))
      .as[(Option[String], Long)].collect().toSet === Set((Some("a"), 1L)))
    assert(TxLog.readEquals(spark, t, "k", Seq("b")).count() === 0L)
  }

  test("merge rewrites only bloom-hit files when ranges cannot prune") {
    val t = table()
    scattered(t, bloom = true)
    val before = TxLog.activeFiles(t).toSet
    // both batch keys live in the i%3==0 file; every file's RANGE admits
    // them, so without the bloom refinement all 3 files would rewrite
    TxLog.merge(spark, t,
      Seq(("user-0300", 9999L, "NEW"), ("user-0600", 9999L, "NEW2"))
        .toDF("k", "ver", "v"),
      Seq("k"), "ver")
    val last = TxLog.commits(t).last
    assert(last.remove.size === 1,
      s"bloom refinement should rewrite exactly the one hit file: ${last.remove}")
    assert(before.intersect(TxLog.activeFiles(t).toSet).size === 2)
    // correctness of the merge itself
    val rows = TxLog.read(spark, t).filter(col("k").isin("user-0300", "user-0600", "user-0299"))
      .as[(String, Long, String)].collect().toSet
    assert(rows === Set(("user-0300", 9999L, "NEW"),
      ("user-0600", 9999L, "NEW2"), ("user-0299", 299L, "v299")))
    // the rewrite carried the index forward: the new file is bloom-probed
    val prunedAfter = TxLog.filesForEquals(spark, t, "k", Seq("user-0300"))
    assert(prunedAfter.size < TxLog.activeFiles(t).size)
  }

  test("an unindexed table merges every range-admitted file (no bloom, no refinement)") {
    val t = table()
    scattered(t, bloom = false)
    TxLog.merge(spark, t,
      Seq(("user-0300", 9999L, "NEW")).toDF("k", "ver", "v"),
      Seq("k"), "ver")
    // ranges overlap everywhere and no blooms exist: all 3 files rewrite
    assert(TxLog.commits(t).last.remove.size === 3)
  }

  test("OPTIMIZE bloomCols builds the index on an existing table") {
    val t = table()
    scattered(t, bloom = false)
    assert(TxLog.activeBlooms(t).isEmpty)
    // cluster by an UNRELATED column so k stays scattered per file — the
    // index, not accidental clustering, must do the pruning
    TxLog.optimize(spark, t, targetFiles = 3,
      clusterBy = Seq(col("ver") % 3), bloomCols = Seq("k"))
    assert(TxLog.activeBlooms(t).nonEmpty)
    val files = TxLog.activeFiles(t)
    val pruned = TxLog.filesForEquals(spark, t, "k", Seq("user-0500"))
    assert(pruned.size < files.size,
      s"index built by OPTIMIZE pruned nothing: $pruned of $files")
    assert(TxLog.readEquals(spark, t, "k", Seq("user-0500")).count() === 1L)
  }

  test("overwrite retires every sidecar; vacuum sweeps them off disk") {
    val t = table()
    scattered(t, bloom = true)
    val old = TxLog.activeBlooms(t)
    assert(old.size === 3)
    TxLog.overwrite(Seq(("z", 1L, "z")).toDF("k", "ver", "v"), t,
      bloomCols = Seq("k"))
    val now = TxLog.activeBlooms(t)
    assert(now.size === 1 && now.intersect(old).isEmpty)
    assert(TxLog.commits(t).last.bloomRemove.toSet === old.toSet)
    // beyond the horizon the retired sidecars are disk garbage
    TxLog.overwrite(Seq(("z2", 1L, "z")).toDF("k", "ver", "v"), t)
    val swept = TxLog.vacuum(t, retainVersions = 1)
    assert(old.forall(swept.contains),
      s"retired sidecars not swept: $swept")
    assert(old.forall(f =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(t, f))))
    // the live snapshot still reads
    assert(TxLog.read(spark, t).count() === 1L)
  }

  test("zero-row writes with bloomCols commit cleanly (nothing to index)") {
    val t = table()
    TxLog.append(Seq(("a", 1L)).toDF("k", "ver"), t, bloomCols = Seq("k"))
    // empty append: Spark still stages a schema-only part file, so the
    // staged set is non-empty but the grouped row count has no groups —
    // this used to NPE on the null max(count)
    TxLog.append(Seq.empty[(String, Long)].toDF("k", "ver"), t,
      bloomCols = Seq("k"))
    assert(TxLog.read(spark, t).count() === 1L)
    // delete-all CDC batch on an indexed table: the merged output is empty
    TxLog.applyChanges(spark, t,
      Seq(("a", 2L, "delete")).toDF("k", "ver", "_op"),
      Seq("k"), "ver", "_op")
    assert(TxLog.read(spark, t).count() === 0L)
  }

  test("plain append to an indexed table keeps indexing new files") {
    val t = table()
    scattered(t, bloom = true)
    // NO bloomCols passed: without a table-properties store the write
    // derives the index config from the active sidecars, like OPTIMIZE
    TxLog.append((900 until 1200 by 3)
      .map(i => (f"user-$i%04d", i.toLong, s"v$i"))
      .toDF("k", "ver", "v").coalesce(1), t)
    assert(TxLog.commits(t).last.bloomAdd.nonEmpty,
      "append dropped the table's bloom index")
    // a key only the appended file holds: the three old files' filters
    // miss it, so the probe prunes below the full file count
    val pruned = TxLog.filesForEquals(spark, t, "k", Seq("user-1101"))
    assert(pruned.size < TxLog.activeFiles(t).size)
    assert(TxLog.readEquals(spark, t, "k", Seq("user-1101")).count() === 1L)
  }

  test("shallow clone carries the bloom index and string stats") {
    val t = table()
    scattered(t, bloom = true)
    val dst = tmpDir("txbloom") + "/clone"
    TxLog.cloneTable(spark, t, dst)
    assert(TxLog.activeBlooms(dst).nonEmpty,
      "clone silently dropped the bloom index")
    assert(TxLog.commits(dst).head.sstats.nonEmpty,
      "clone silently dropped string stats")
    val pruned = TxLog.filesForEquals(spark, dst, "k", Seq("user-0500"))
    assert(pruned.size < TxLog.activeFiles(dst).size,
      s"cloned index pruned nothing: $pruned")
    assert(TxLog.readEquals(spark, dst, "k", Seq("user-0500")).count() === 1L)
  }

  test("probe typing: wrong-class probes fail descriptively, not silently") {
    val t = table()
    TxLog.append(Seq(("a", 1L)).toDF("k", "ver"), t, bloomCols = Seq("ver"))
    // Int probe on a bigint column: used to throw an opaque Literal error
    val e = intercept[IllegalArgumentException] {
      TxLog.filesForEquals(spark, t, "ver", Seq(1))
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
    // epoch-millis Long on a timestamp column: used to hash the Long as
    // the INTERNAL micros value and return silently-empty results
    val t2 = table()
    TxLog.append(Seq(Tuple1(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("ts"), t2, bloomCols = Seq("ts"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.filesForEquals(spark, t2, "ts", Seq(1704067200000L))
    }
    assert(e2.getMessage.contains("timestamp"), e2.getMessage)
    // the correctly-typed probe still reads
    assert(TxLog.readEquals(spark, t2, "ts",
      Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).count() === 1L)
  }

  test("SQL point lookups bloom-prune through the txlog view") {
    val t = table()
    scattered(t, bloom = true)
    // every file's string RANGE spans the key domain, so only the bloom
    // probe can prune — readPruned with equality probes must cut the set
    val all = TxLog.activeFiles(t).size
    val pruned = TxLog.readPruned(spark, t, Map.empty, Map.empty,
      eqProbes = Map("k" -> Seq("user-0500"))).inputFiles.length
    assert(pruned < all, s"bloom probes pruned nothing: $pruned of $all")
    // end-to-end SQL: =, IN, absent key, and a non-indexed column —
    // all exact, the indexed ones file-pruned inside the relation
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(s"""CREATE TEMPORARY VIEW blsql_$id
                 |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    def q(w: String): Set[(String, Long)] =
      spark.sql(s"SELECT k, ver FROM blsql_$id WHERE $w")
        .as[(String, Long)].collect().toSet
    assert(q("k = 'user-0500'") === Set(("user-0500", 500L)))
    assert(q("k IN ('user-0500', 'user-0501')") ===
      Set(("user-0500", 500L), ("user-0501", 501L)))
    assert(q("k = 'user-9999'") === Set.empty)
    assert(q("ver = 500") === Set(("user-0500", 500L)))
    spark.catalog.dropTempView(s"blsql_$id")
  }

  test("copy-on-write DML keeps the declared index and stats alive") {
    val t = table()
    TxLog.setProperties(t,
      Map("graft.bloom.columns" -> "k", "graft.stats.columns" -> "ver"))
    scattered(t, bloom = false) // property-declared: appends index anyway
    assert(TxLog.activeBlooms(t).nonEmpty)
    // DELETE rewrites the touched file; the replacement must re-index
    // and re-record stats, not silently degrade (the merge no-decay rule
    // on the DML path)
    TxLog.delete(spark, t, col("k") === "user-0300")
    val last = TxLog.commits(t).last
    assert(last.op === "delete")
    assert(last.bloomAdd.nonEmpty, "DML rewrite lost the bloom index")
    assert(last.stats.nonEmpty, "DML rewrite lost the declared stats")
    assert(TxLog.readEquals(spark, t, "k", Seq("user-0300")).count() === 0L)
    assert(TxLog.readEquals(spark, t, "k", Seq("user-0303")).count() === 1L)
    assert(TxLog.read(spark, t).count() === 899L)
  }

  test("DV'd rows stay dead through the bloom-pruned read path") {
    val t = table()
    scattered(t, bloom = true)
    TxLog.deleteVectors(spark, t, col("k") === "user-0500")
    assert(TxLog.readEquals(spark, t, "k", Seq("user-0500")).count() === 0L)
    assert(TxLog.readEquals(spark, t, "k", Seq("user-0503")).count() === 1L)
  }
}
