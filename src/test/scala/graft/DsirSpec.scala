package graft

import org.apache.spark.sql.functions._

import graft.ext.Dsir

/** DSIR importance resampling (Xie et al. 2023): hashed uni+bigram
  * log-ratio weights trained from two bounded histogram passes, scored
  * scan-side, per-source top-fraction selection. Load-bearing
  * invariants: the feature expression emits unigrams AND adjacent
  * bigrams in the scorer's own bucket space, the weights actually pull
  * target-like documents up, the scan-side score is bit-identical to an
  * explode+join recompute (the oracle shape), and the per-source rank
  * rule keeps exactly ceil(0.2·n) documents. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("ngram buckets = unigrams + adjacent bigrams in pmod(hash) space") {
    val dim = 64
    val rows = Seq("a b c", "solo", "", "x  y").toDF("text")
      .select(Dsir.ngramBuckets($"text", dim).alias("b"))
      .as[Seq[Int]].collect()
    // "a b c" → 3 unigrams + 2 bigrams; "solo" → 1; "" → 0; double space
    // collapses ("x","y","x y")
    assert(rows.map(_.length).toSeq === Seq(5, 1, 0, 3))
    assert(rows.flatten.forall(b => b >= 0 && b < dim))
    val expected = Seq("a", "b", "c", "a b", "b c").toDF("g")
      .select(pmod(hash($"g"), lit(dim))).as[Int].collect().toSeq
    assert(rows(0) === expected, "bucket ids must be pmod(hash(gram), dim)")
  }

  test("weights rank target-like documents above the rest") {
    val docs = (0 until 120).map { i =>
      val filler = (0 to 3).map(j => s"w${(i + j) % 11}").mkString(" ")
      val text =
        if (i % 3 == 0) s"quality corpus marker $filler" else filler
      (i.toLong, text, i % 3 == 0)
    }.toDF("id", "text", "is_target")
    val model = Dsir.train(docs.filter($"is_target"), docs, "text",
      dim = 256, maxSample = 10000)
    val scored = docs.select($"is_target",
      Dsir.logWeight($"text", model).alias("logw"))
    val Array(tMean, rMean) = scored.groupBy($"is_target")
      .agg(avg($"logw")).orderBy($"is_target".desc)
      .select("avg(logw)").as[Double].collect()
    assert(tMean > rMean + 1.0,
      s"target docs must score clearly higher ($tMean vs $rMean)")
  }

  test("scan-side logw equals an explode+join recompute bit-for-bit") {
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 to i % 7).map(j => s"t${(i * 3 + j) % 17}").mkString(" "))
    }.toDF("id", "text")
    val model = Dsir.train(docs.limit(20), docs, "text",
      dim = 128, maxSample = 10000)
    val direct = docs.select($"id",
      Dsir.logWeight($"text", model).alias("logw"))
    val weights = Dsir.modelFrame(spark, model)
    val replay = docs
      .select($"id", explode_outer(Dsir.ngramBuckets($"text", 128))
        .alias("bucket"))
      .join(weights, Seq("bucket"), "left")
      .groupBy($"id").agg(coalesce(sum($"w"), lit(0d)).alias("logw"))
    assert(direct.exceptAll(replay).isEmpty &&
      replay.exceptAll(direct).isEmpty,
      "dyadic sums must agree bit-for-bit regardless of fold order")
  }

  test("per-source selection keeps exactly ceil(0.2·n) of each source") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0 until 90).map { i =>
      (i.toLong, s"src${i % 4}", s"d${i % 9} text ${i % 5}")
    }.toDF("doc_id", "source", "text")
    val model = Dsir.train(docs.limit(30), docs, "text",
      dim = 64, maxSample = 10000)
    val bySource = Window.partitionBy("source")
    val kept = docs
      .select($"doc_id", $"source",
        Dsir.logWeight($"text", model).alias("logw"))
      .withColumn("rk", row_number().over(
        bySource.orderBy($"logw".desc, $"doc_id".asc)))
      .withColumn("n", count(lit(1)).over(bySource))
      .filter($"rk" <= ceil($"n" * 0.2))
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    // 4 sources: 23, 23, 22, 22 docs → ceil(0.2·n) = 5 each
    assert(kept.values.toSeq === Seq.fill(4)(5L),
      s"each source keeps ceil(0.2·n): $kept")
  }
}
