package graft

import org.apache.spark.sql.functions._

import graft.ext.QualityClassifier

/** Model-based quality filtering (the CCNet/GPT-3 classifier stage):
  * train MLlib LR on hashed bag-of-words, score scan-side as an exact
  * dyadic expression. The load-bearing invariants: HashingTF's bucketing
  * equals `pmod(hash(t), dim)` (training and scoring share one feature
  * space), the model actually learns a text-derivable weak label, and
  * the scan-side logit is bit-identical to an explode+join recompute
  * (the cross-engine oracle shape). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("training histogram counts exactly the scorer's buckets") {
    val dim = 64
    val docs = Seq("the spark slow 数据 a-b the the", "", "solo").toDF("text")
    val rows = docs.select(
      QualityClassifier.buckets($"text", dim).alias("bkts"),
      QualityClassifier.bucketHistogram($"text", dim).alias("hist"))
      .as[(Seq[Int], Seq[Double])].collect()
    rows.foreach { case (bkts, hist) =>
      assert(hist.length === dim)
      assert(hist.sum === bkts.length.toDouble, "histogram mass = tokens")
      bkts.groupBy(identity).foreach { case (b, g) =>
        assert(hist(b) === g.length.toDouble,
          s"bucket $b count must match the scorer's bucketing")
      }
    }
  }

  test("learns a lexicon weak label; keep verdict = logit sign") {
    // half the docs carry the marker token amid shared filler — a
    // hashed-linear model separates them by construction
    val docs = (0 until 200).map { i =>
      val filler = Seq("alpha", "beta", "gamma", "delta")
        .map(w => s"$w${i % 7}").mkString(" ")
      val text = if (i % 2 == 0) s"$filler marker $filler" else s"$filler $filler"
      (i.toLong, text, if (i % 2 == 0) 1 else 0)
    }.toDF("id", "text", "label")
    val model = QualityClassifier.train(docs, "text", "label", dim = 256)
    val scored = docs.select($"label",
      QualityClassifier.keep($"text", model).cast("int").alias("pred"),
      QualityClassifier.logit($"text", model).alias("logit"))
    val acc = scored.filter($"label" === $"pred").count() / 200.0
    assert(acc >= 0.95, s"classifier must learn the marker, accuracy $acc")
    // verdict is exactly the logit's sign — no separate sigmoid path
    assert(scored.filter(($"logit" >= 0) =!= ($"pred" === 1)).isEmpty)
  }

  test("scan-side logit equals an explode+join recompute bit-for-bit") {
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 to i % 9).map(j => s"w${(i + j) % 13}").mkString(" "),
        i % 3 min 1)
    }.toDF("id", "text", "label")
    val model = QualityClassifier.train(docs, "text", "label", dim = 128)
    val direct = docs.select($"id",
      QualityClassifier.logit($"text", model).alias("logit"))
    val toks = docs.select($"id",
      explode(QualityClassifier.buckets($"text", model.dim)).alias("bucket"))
    val w = QualityClassifier.modelFrame(spark, model)
    val replay = docs.select($"id")
      .join(toks.join(w.filter($"bucket" >= 0), Seq("bucket"))
        .groupBy("id").agg(sum($"w").alias("dot")), Seq("id"), "left")
      .select($"id",
        (coalesce($"dot", lit(0d)) + lit(model.bias)).alias("logit"))
    // dyadic weights: both association orders sum EXACTLY — require
    // bit-equality, the property the cross-engine oracle leans on
    assert(direct.join(replay, Seq("id"))
      .filter(direct("logit") =!= replay("logit")).isEmpty,
      "dyadic logits must be order-independent exact")
  }
}
