package graft

import org.apache.spark.sql.functions._

import graft.ops.TxLog

/** Bucket-transform pruning (Iceberg's `bucket(n, col)` partition
  * transform, declared as `bkt GENERATED ALWAYS AS (pmod(hash(b), n))` +
  * partition-by-bkt): an equality probe on the BASE column derives the
  * exact bucket, so a point lookup opens 1/n of the table's files even
  * though hash scatter makes min/max stats useless and the query never
  * names the bucket column. The derivation must equal Spark's own hash
  * bit-for-bit (it is computed with the engine's Murmur3Hash expression
  * over a Literal of the logged type), refuse class-crossed probes, and
  * never fire when the query constrains the bucket column itself. */
class BucketTransformPruneSpec extends SparkSpec {
  import spark.implicits._

  /** A bucket-partitioned table over long keys 1..64, 8 buckets. */
  private def longTable(n: Int = 8): String = {
    val t = tmpDir("bktp_long") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.bkt" -> s"pmod(hash(k), $n)",
      "graft.partition.columns" -> "bkt"))
    TxLog.append((1L to 64L).map(k => (k, s"v$k")).toDF("k", "v"), t)
    t
  }

  test("equality probe on the base column derives the exact bucket") {
    val t = longTable()
    assert(TxLog.activeFiles(t).count(_.contains("bkt=")) >= 8,
      "fixture must scatter across all 8 buckets")
    val probes = TxLog.deriveGeneratedEqProbes(t, None, Map("k" -> Seq(7L)))
    assert(probes.contains("bkt"), "derivation must add a bucket probe")
    // bit-for-bit against the engine's own evaluation of the expression
    val want = spark.sql("SELECT pmod(hash(7L), 8)").as[Int].head()
    assert(probes("bkt") === Seq(want))
    val pruned = TxLog.readPruned(spark, t, Map.empty, Map.empty,
      eqProbes = probes)
    assert(pruned.inputFiles.length < TxLog.activeFiles(t).size,
      "non-matching bucket directories must be pruned")
    assert(pruned.inputFiles.forall(_.contains(s"bkt=$want")),
      "every surviving file sits in the probed bucket")
    assert(pruned.filter($"k" === 7L).as[(Long, String, Int)].collect()
      .map(r => (r._1, r._2)) === Array((7L, "v7")))
  }

  test("the SQL relation prunes a plain point lookup to one bucket") {
    val t = longTable()
    val id = java.util.UUID.randomUUID.toString.take(8)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW bktp_v_$id
         |USING graft.sources.txlog OPTIONS (path '$t')""".stripMargin)
    val got = spark.sql(s"SELECT v FROM bktp_v_$id WHERE k = 42")
      .as[String].collect()
    assert(got === Array("v42"), "derived pruning must not drop the row")
    // IN-lists derive one probe per value: both rows survive
    val in2 = spark.sql(
      s"SELECT v FROM bktp_v_$id WHERE k IN (3, 59) ORDER BY v")
      .as[String].collect()
    assert(in2 === Array("v3", "v59"))
  }

  test("class-crossed probes derive nothing (no silent wrong-bucket)") {
    val t = longTable()
    // k is LONG; an Int probe must not hash (hash(7) != hash(7L))
    val probes = TxLog.deriveGeneratedEqProbes(t, None, Map("k" -> Seq(7)))
    assert(!probes.contains("bkt"),
      "an Int probe on a bigint column must not derive a bucket")
    // and a null probe likewise
    val p2 = TxLog.deriveGeneratedEqProbes(t, None,
      Map("k" -> Seq(7L, null)))
    assert(!p2.contains("bkt"))
  }

  test("derivation skipped when the query constrains the bucket itself") {
    val t = longTable()
    val viaEq = TxLog.deriveGeneratedEqProbes(t, None,
      Map("k" -> Seq(7L), "bkt" -> Seq(3)))
    assert(viaEq("bkt") === Seq(3), "explicit probe wins untouched")
    val viaRange = TxLog.deriveGeneratedEqProbes(t, None,
      Map("k" -> Seq(7L)), constrained = Set("bkt"))
    assert(!viaRange.contains("bkt"),
      "a range-constrained bucket column must not get a derived probe")
  }

  test("string base column buckets and prunes") {
    val t = tmpDir("bktp_str") + "/t"
    TxLog.setProperties(t, Map(
      "graft.generated.bkt" -> "pmod(hash(name), 4)",
      "graft.partition.columns" -> "bkt"))
    TxLog.append((1 to 40).map(i => (s"user_$i", i)).toDF("name", "score"), t)
    val probes = TxLog.deriveGeneratedEqProbes(t, None,
      Map("name" -> Seq("user_17")))
    val want = spark.sql("SELECT pmod(hash('user_17'), 4)").as[Int].head()
    assert(probes.get("bkt").contains(Seq(want)))
    val pruned = TxLog.readPruned(spark, t, Map.empty, Map.empty,
      eqProbes = probes)
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains(s"bkt=$want")))
    assert(pruned.filter($"name" === "user_17").count() === 1)
  }

  test("hash(b) % n (plain remainder) is refused as a bucket shape") {
    val t = tmpDir("bktp_rem") + "/t"
    TxLog.setProperties(t, Map("graft.generated.bkt" -> "hash(k) % 8"))
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    val probes = TxLog.deriveGeneratedEqProbes(t, None, Map("k" -> Seq(1L)))
    assert(!probes.contains("bkt"),
      "% yields negative buckets — only pmod is the recognized transform")
  }
}
