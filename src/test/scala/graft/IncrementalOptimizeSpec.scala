package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Clustering-aware incremental OPTIMIZE (the Delta liquid-clustering
  * maintenance shape): on a `graft.cluster.columns` table, plain
  * OPTIMIZE rewrites ONLY files written since the last OPTIMIZE (plus
  * still-small optimize outputs) into cluster-sorted, range-disjoint
  * files — already-clustered big files stay byte-identical, and an
  * immediate re-run is a no-op. Maintenance cost follows the NEW data,
  * not the table — the nightly operation a 100 TB table can actually
  * afford, where a full re-sort is the one that cannot ship. */
class IncrementalOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): String = {
    val t = tmpDir("incropt") + "/t"
    TxLog.setProperties(t, Map(
      "graft.cluster.columns" -> "k", "graft.stats.columns" -> "k"))
    // three appends, interleaved key ranges — per-batch cluster-sorted
    // by the declared-cluster write path, but ranges overlap ACROSS
    // batches until an OPTIMIZE merges them
    (0 until 3).foreach { r =>
      TxLog.append((1 to 30).filter(_ % 3 == r)
        .map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t)
    }
    t
  }

  test("first run clusters everything; immediate re-run is a no-op") {
    val t = fixture()
    val v1 = TxLog.optimizeIncremental(spark, t, minFileSizeBytes = 0L,
      targetBytes = Some(2048L))
    assert(v1.nonEmpty, "unclustered files must rewrite")
    val filesAfter = TxLog.activeFiles(t)
    // outputs are range-disjoint on the clustering key (recorded stats:
    // the adding commit carries min/max per file — fold via commits)
    val statsByFile = TxLog.commits(t)
      .flatMap(_.stats.toSeq).toMap.filter(e => filesAfter.contains(e._1))
    val ranges = statsByFile.flatMap { case (f, cols) =>
      cols.get("k").map(r => (f, r._1, r._2)) }.toSeq.sortBy(_._2)
    assert(ranges.size === filesAfter.size)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 <= b._2,
        s"optimize outputs must own disjoint key ranges: $a vs $b")
      case _ => ()
    }
    val noop = TxLog.optimizeIncremental(spark, t, minFileSizeBytes = 0L)
    assert(noop.isEmpty, "an immediate second run must be a no-op")
    assert(TxLog.latestVersion(t) === Some(v1.get),
      "the no-op must not commit")
    assert(TxLog.read(spark, t).count() === 30)
  }

  test("later appends rewrite alone; clustered files stay byte-identical") {
    val t = fixture()
    TxLog.optimizeIncremental(spark, t, minFileSizeBytes = 0L)
    val clustered = TxLog.activeFiles(t).toSet
    // two more appends land new, unclustered files
    TxLog.append((31 to 34).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1), t)
    TxLog.append((35 to 38).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1), t)
    val v2 = TxLog.optimizeIncremental(spark, t, minFileSizeBytes = 0L)
    assert(v2.nonEmpty, "the new files must rewrite")
    val commit = TxLog.commits(t).find(_.version == v2.get).get
    assert(commit.remove.toSet.intersect(clustered).isEmpty,
      "already-clustered files must not be touched")
    assert(clustered.subsetOf(TxLog.activeFiles(t).toSet),
      "clustered files stay active and byte-identical")
    assert(TxLog.read(spark, t).count() === 38)
  }

  test("SQL: plain OPTIMIZE is incremental on clustered tables; FULL forces") {
    val t = fixture()
    spark.sql(s"OPTIMIZE txlog.`$t`").collect()
    val v1 = TxLog.latestVersion(t).get
    assert(TxLog.commits(t).exists(c =>
      c.version == v1 && c.op == "optimize"))
    // incremental: an immediate re-run commits nothing
    spark.sql(s"OPTIMIZE txlog.`$t`").collect()
    assert(TxLog.latestVersion(t).get === v1, "plain re-OPTIMIZE is a no-op")
    // FULL re-clusters the whole snapshot (clustered + new alike)
    TxLog.append((31 to 32).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1), t)
    val clustered = TxLog.commits(t).find(_.version == v1).get.add.toSet
    spark.sql(s"OPTIMIZE txlog.`$t` FULL").collect()
    val vFull = TxLog.latestVersion(t).get
    val fullCommit = TxLog.commits(t).find(_.version == vFull).get
    assert(fullCommit.op === "optimize" &&
      clustered.subsetOf(fullCommit.remove.toSet),
      "FULL must rewrite even the already-clustered files")
    assert(TxLog.read(spark, t).count() === 32)
  }

  test("refuses on a table with no declared clustering") {
    val t = tmpDir("incropt_none") + "/t"
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.optimizeIncremental(spark, t)
    }
    assert(e.getMessage.contains("graft.cluster.columns"), e.getMessage)
  }
}
