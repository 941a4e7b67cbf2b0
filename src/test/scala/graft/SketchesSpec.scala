package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bm25, CountMin, TfIdf}

/** Count-Min sketch + BM25 — the session's two exact-arithmetic
  * additions. Load-bearing invariants: CM never underestimates and is
  * exact for collision-free keys, merged sketches equal the sketch of
  * the union, and BM25's dyadic-floored saturation makes the scan-side
  * score bit-identical to an explode+join recompute while preserving
  * the classic ranking behaviors (tf saturation, length normalization,
  * rare-term preference). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min never underestimates; exact when width is ample") {
    val items = (0 until 1000).map(i => s"k${i % 40}").toDF("k")
    val sk = CountMin.sketch(items, "k", depth = 3, width = 1024)
    val exact = items.groupBy($"k".alias("item"))
      .agg(count(lit(1)).alias("cnt"))
    val est = CountMin.estimate(exact, "item", sk, depth = 3, width = 1024)
    val joined = exact.join(est, Seq("item"))
    assert(joined.filter($"cms_est" < $"cnt").isEmpty, "one-sided error")
    // 40 keys in 3×1024 buckets: min over 3 rows collides with prob ~0 —
    // and hash/pmod are deterministic, so this is a stable assertion
    assert(joined.filter($"cms_est" =!= $"cnt").isEmpty,
      "ample width ⇒ exact counts")
  }

  test("narrow sketch overestimates colliding keys, never misses mass") {
    val items = (0 until 2000).map(i => s"key$i").toDF("k")
    val sk = CountMin.sketch(items, "k", depth = 2, width = 16)
    // every key occurs once; with 2000 keys in 2×16 buckets estimates
    // are large — but never below 1
    val est = CountMin.estimate(items.distinct(), "k", sk,
      depth = 2, width = 16)
    assert(est.filter($"cms_est" < 1).isEmpty)
    assert(est.filter($"cms_est" > 1).count() > 0, "collisions must show")
  }

  test("merged slice sketches equal the sketch of the union") {
    val a = (0 until 300).map(i => s"k${i % 17}").toDF("k")
    val b = (0 until 200).map(i => s"k${i % 11}").toDF("k")
    val merged = CountMin.merge(Seq(
      CountMin.sketch(a, "k", 3, 64), CountMin.sketch(b, "k", 3, 64)))
    val whole = CountMin.sketch(a.unionAll(b), "k", 3, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("bm25 scan-side score equals an explode+join recompute bit-for-bit") {
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 to i % 9).map(j => s"w${(i + j) % 13}").mkString(" "))
    }.toDF("doc_id", "text")
    val terms = Seq("w0", "w5", "w12")
    val tok = TfIdf.tokenized(docs, "doc_id", "text")
    val lens = Bm25.docLengths(docs, "doc_id", "text")
    val idf = Bm25.idf(tok, docs.count(), terms)
    val st = Bm25.stats(lens)
    val direct = Bm25.score(tok, lens, idf, st)
    // recompute with the join/group order shuffled: same dyadic summands
    val avgdl = col("total_toks").cast("double") / col("n_docs").cast("double")
    val replay = tok.join(idf, Seq("token"))
      .groupBy("doc", "token", "idf_micro").agg(count(lit(1)).alias("tf"))
      .join(lens, Seq("doc")).crossJoin(st)
      .select($"doc", ($"idf_micro" *
        Bm25.saturation($"tf", $"len", avgdl)).alias("s"))
      .repartition(7)
      .groupBy("doc").agg(sum($"s").alias("bm25_micro"))
    assert(direct.exceptAll(replay).isEmpty &&
      replay.exceptAll(direct).isEmpty,
      "dyadic summands ⇒ order-free, bit-equal totals")
  }

  test("bm25 ranking behaviors: saturation, length norm, rare-term weight") {
    val docs = Seq(
      (1L, "apple banana cherry date egg fig"),          // 1 hit, len 6
      (2L, "apple apple apple apple apple apple"),       // 6 hits, len 6
      (3L, "apple banana"),                              // 1 hit, len 2
      (4L, "rare banana cherry date egg fig"),           // rare term, len 6
      (5L, "banana cherry date egg fig grape")           // no hits
    ).toDF("doc_id", "text")
    val terms = Seq("apple", "rare")
    val tok = TfIdf.tokenized(docs, "doc_id", "text")
    val lens = Bm25.docLengths(docs, "doc_id", "text")
    val scores = Bm25.score(tok, lens,
        Bm25.idf(tok, docs.count(), terms), Bm25.stats(lens))
      .as[(Long, Double)].collect().toMap
    assert(!scores.contains(5L), "no query term ⇒ no row")
    assert(scores(2L) > scores(1L), "more tf scores higher")
    assert(scores(2L) < 7 * scores(1L), "…but saturates well below tf·")
    assert(scores(3L) > scores(1L), "shorter doc, same tf ⇒ higher")
    assert(scores(4L) > scores(1L), "rarer term (df 1 vs 3) outweighs")
  }
}
