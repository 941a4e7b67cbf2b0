package graft

import org.apache.spark.sql.functions._

import graft.ext.PipelineOps
import graft.ops.{AsofJoin, BloomSemi}

/** Dataset-assembly operators: as-of join semantics, bloom semi-join
  * equivalence, split determinism, packing budget properties,
  * contamination detection. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward join: latest at-or-before match per key, null when none precedes") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L),
      (4L, 200L, 50L)).toDF("id", "k", "ts")
    val right = Seq((100L, 10L, "a"), (100L, 20L, "b"), (300L, 1L, "z"))
      .toDF("rk", "rts", "v")
    val out = AsofJoin.asofBackward(left, "k", "ts", right, "rk", "rts",
      Seq("v")).collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.toString), Option(r.getAs[String]("v")))).toMap
    assert(out(1L) === (Some("10"), Some("a")))   // exact-ts match included
    assert(out(2L) === (Some("20"), Some("b")))   // latest of two
    assert(out(3L) === (None, None))              // nothing at/before ts=5
    assert(out(4L) === (None, None))              // key has no right rows
  }

  test("bloom semi-join equals the exact semi-join") {
    val orders = Tables.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables.load(spark, SF, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val viaBloom = BloomSemi.semiJoin(orders, cust, "o_custkey", "c_custkey")
      .collect().map(_.getLong(0)).toSet
    val exact = orders.join(cust, col("o_custkey") === col("c_custkey"),
      "left_semi").collect().map(_.getLong(0)).toSet
    assert(viaBloom === exact)
  }

  test("bloom semi-join survives a shared key column name (dim side aliased)") {
    val orders = Tables.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    val dim = Tables.load(spark, SF, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").alias("o_custkey")) // same name as fact key
    val viaBloom = BloomSemi.semiJoin(orders, dim, "o_custkey", "o_custkey")
      .collect().map(_.getLong(0)).toSet
    val exact = orders.join(
        dim.withColumnRenamed("o_custkey", "k"),
        col("o_custkey") === col("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(viaBloom === exact)
  }

  test("bloom semi-join rejects non-integral keys with a clear message") {
    val fact = Tables.load(spark, SF, "customer")
    val e = intercept[IllegalArgumentException] {
      BloomSemi.semiJoin(fact, fact.select("c_mktsegment"),
        "c_mktsegment", "c_mktsegment")
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("split assignment is deterministic, complete, and stable under corpus growth") {
    val small = (0L until 200L).toDF("id")
    val big = (0L until 1000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val sMap = PipelineOps.assignSplit(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bMap = PipelineOps.assignSplit(big, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth never reassigns an existing row
    sMap.foreach { case (id, sp) => assert(bMap(id) === sp) }
    val frac = bMap.values.groupBy(identity).view.mapValues(_.size / 1000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05, frac)
    assert(frac.values.sum === 1.0)
  }

  test("greedy packing respects the budget; oversized rows get their own pack") {
    val rows = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 600L), (5L, 50L))
      .map { case (i, w) => ("g", i, w) }.toDF("grp", "ord", "w")
    val packs = PipelineOps.greedyPack(rows, "grp", "ord", "w", budget = 512)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 300 | 300+100 | 600 (oversize alone) | 50
    assert(packs === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val fills = packs.groupBy(_._2).map { case (p, m) =>
      p -> m.keys.map(i => Map(1L -> 300L, 2L -> 300L, 3L -> 100L,
        4L -> 600L, 5L -> 50L)(i)).sum }
    fills.foreach { case (p, f) =>
      assert(f <= 512 || fills.count(_._1 == p) == 1, s"pack $p holds $f") }
  }

  test("budget packing chunk ids are monotone and bounded by total/budget") {
    val docs = Tables.load(spark, SF, "documents").select(col("doc_id"),
      col("lang"), graft.ext.TextAnalysis.tokenCount(col("text")).alias("n"))
    val packed = PipelineOps.budgetPack(docs, "lang", "doc_id", "n", 512)
    val perLang = packed.groupBy("lang")
      .agg(max("pack_id").alias("mx"), sum("n").alias("tot")).collect()
    perLang.foreach { r =>
      assert(r.getInt(1) <= r.getLong(2) / 512, r.toString) }
  }

  test("contamination flags the planted duplicate and not the disjoint doc") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "something about the quick brown fox jumps high"),
      (101L, "entirely unrelated content with zero overlap here"))
      .toDF("doc_id", "text")
    val out = PipelineOps.contamination(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.contains(100L) && out(100L) > 0.0)
    assert(!out.contains(101L))
  }

  test("contamination scans the corpus exactly once (single shingle pass)") {
    // r11 verdict: the old shape re-derived the distinct-shingle sets in
    // a second totals branch — two full corpus scans. The one-pass shape
    // (broadcast LEFT join + one per-doc agg) must leave exactly two
    // leaves in the optimized plan: one corpus scan, one benchmark scan.
    val docs = Tables.load(spark, SF, "documents")
    val plan = PipelineOps.contamination(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        "doc_id", "text", 3)
      .queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 2, plan.treeString)
  }

  test("hashed contamination equals the string-shingle variant") {
    // the 8-byte-hash scale path must not change the answer — per-doc
    // shared/total counts and ratios identical on a corpus with planted
    // full, partial, and zero overlap
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents")
    val (corpus, bench) =
      (docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val viaStrings = key(
      PipelineOps.contamination(corpus, bench, "doc_id", "text", 3)
        .select(col("doc_id"), col("n_shared").cast("long"),
          col("n_total").cast("long"), col("contamination")))
    val viaHashes = key(
      PipelineOps.contaminationHashed(corpus, bench, "doc_id", "text", 3)
        .select(col("doc_id"), col("n_shared").cast("long"),
          col("n_total").cast("long"), col("contamination")))
    assert(viaHashes === viaStrings)
    assert(viaHashes.nonEmpty)
  }
}
