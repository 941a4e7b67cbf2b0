package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Correctness of the extension tier that the DuckDB oracle can't check
  * (hash-based signatures, ANN recall, language ID, stub codec). */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy cat again and again"),
    (2L, "completely different words live in this document entirely"),
    (3L, "the quick brown fox jumps over the lazy dog again and again")
  ).toDF("doc_id", "text")

  test("dedup exact: identical texts share a canonical id") {
    val r = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("canonical_id", "copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r.contains((0L, 2L))) // doc 0 & 3 → canonical 0, copies 2
    assert(r.size === 3)
  }

  test("dedup minhash-LSH: finds the exact and near duplicate, not the distinct doc") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 3L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 === 1.0)
    assert(!keys.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dedup simhash: identical docs at Hamming 0; distinct doc excluded at tight radius") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => (p._1, p._2) == (0L, 3L) && p._3 == 0))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("jaccard column semantics (distinct-set intersection over union)") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("fingerprints: equal for identical text, disjoint-ish for different text") {
    graft.functions.GraftFunctions.register(spark)
    val fps = docs.select(col("doc_id"),
        TextAnalysis.fingerprints(col("text")).alias("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(0L) === fps(3L))
    assert(fps(0L).intersect(fps(2L)).isEmpty)
  }

  test("brute-force top-k picks the true nearest neighbor") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 1)
      .select("n_id").head().getLong(0)
    assert(top1 === 1L)
  }

  test("LSH ANN: deterministic, with a pinned recall floor vs brute force") {
    val emb = Tables.load(spark, SF, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall floor at a bucket width sized for this corpus: 500 uniform-
    // RANDOM vectors are LSH's worst case (no cluster structure, cosine
    // margins ~1e-3), and 2^12 default buckets over 500 rows leaves
    // nearly every point alone (measured recall@5 0.04). nPlanes=4 →
    // 16 buckets measures 0.54 recall@5 on this fixed seed; the floor
    // pins a margin below so a hashing/bucketing regression fails here,
    // not in an application
    val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
        nPlanes = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.35, s"recall@5 was $recall (floor 0.35)")
    // determinism: fixed-seed planes ⇒ identical resultsets across runs
    val ann2 = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
        nPlanes = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann === ann2)
  }

  test("native vec_dot is bit-identical to the HOF fold") {
    import graft.functions.{GraftFunctions, VectorFunctions}
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, SF, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding"))
    val both = emb.alias("a").crossJoin(emb.alias("b"))
      .select(
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")).alias("hof"),
        GraftFunctions.vecDot(col("a.embedding"), col("b.embedding")).alias("native"))
    // bitwise: no tolerance
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    // and SQL registration path works
    emb.createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM emb_v LIMIT 1")
    assert(viaSql.head().getDouble(0) > 0)
  }

  test("ANN top-k serves queries that are NOT corpus rows (own vectors, not corpus lookups)") {
    val corpus = Seq((1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    // nPlanes=1 → own bucket + 1-bit probe covers every bucket: exact
    val lsh = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        k = 1, nPlanes = 1, dim = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.toSeq === Seq((100L, 1L)))
    // nCells=2, nProbe=2 → every cell probed: exact
    val ivf = graft.ext.IvfIndex.topK(corpus, queries, "vec_id", "embedding",
        k = 1, nCells = 2, nProbe = 2)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.toSeq === Seq((100L, 1L)))
  }

  test("IVF ANN: pinned recall floor at half-probe; exhaustive probing IS brute force") {
    val emb = Tables.load(spark, SF, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // half the cells probed: measured recall@5 0.84 on this fixed seed
    // (uniform-random worst case); floor with margin so a centroid-train
    // or cell-routing regression fails the spec, not a user
    val ivf = graft.ext.IvfIndex.topK(emb, queries, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall@5 was $recall (floor 0.7)")
    // the index's exactness invariant: probing EVERY cell must recover
    // brute force identically — if this drifts, candidates are being
    // dropped somewhere other than cell routing
    val full = graft.ext.IvfIndex.topK(emb, queries, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 16)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact, "nProbe=nCells must equal brute force")
  }

  test("two-level IVF: candidates are a subset of flat probing's cells, recall holds") {
    val emb = Tables.load(spark, SF, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val fine = graft.ext.IvfIndex.train(emb, "embedding", nCells = 32)
    val cands = graft.ext.IvfIndex.twoLevelCandidates(
      emb, queries, "vec_id", "embedding", fine,
      coarseCells = 6, nProbeCoarse = 3, nProbeFine = 8)
    // every query routed somewhere; no self-pairs; ids distinct
    val rows = cands.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).distinct.length === queries.count())
    assert(rows.forall { case (q, n) => q != n })
    assert(rows.distinct.length === rows.length)
    // recall vs exact top-5 — coarse routing must not destroy the shortlist
    val exact = graft.ext.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.ext.Similarity.topKFromCandidates(cands,
        queries.select(col("vec_id").alias("id"), col("embedding").alias("vec")),
        emb.select(col("vec_id").alias("id"), col("embedding").alias("vec")), 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // measured 0.76 recall@5 at these fixed-seed params (3/6 coarse ×
    // 8/32 fine on uniform-random vectors); floor with margin
    assert(recall >= 0.6, s"recall@5 was $recall (floor 0.6)")
    // probing 3 of 6 coarse groups × 8 fine cells bounds the candidate set
    // below a full scan: the point of the hierarchy
    assert(rows.length < queries.count() * emb.count(),
      "two-level candidates degenerated to all-pairs")
  }

  test("LSH tuning helpers: band split matches the S-curve, planes scale log2") {
    // 64 hashes, want pairs above ~0.8 jaccard: (1/b)^(1/r) nearest 0.8
    val (b8, r8) = Dedup.bandsFor(64, 0.8)
    assert(b8 * r8 === 64)
    assert(math.abs(math.pow(1.0 / b8, 1.0 / r8) - 0.8) < 0.15, s"($b8,$r8)")
    // lower threshold → more bands (more candidates)
    val (b3, _) = Dedup.bandsFor(64, 0.3)
    assert(b3 > b8)
    assert(Similarity.planesFor(1000000, 256) === 12)
    assert(Similarity.planesFor(500, 256) >= 1)
  }

  test("language ID picks the profile language on natural sentences") {
    val samples = Seq(
      ("en", "the cat is on the mat and it is a fine day for this"),
      ("fr", "le chat est dans la maison et il est content du jour"),
      ("de", "der hund ist in dem haus und er ist mit dem ball"),
      ("es", "el perro es grande y la casa es bonita para el gato")
    ).toDF("expected", "text")
    val preds = samples.select(col("expected"),
        TextAnalysis.languageId(col("text")).getField("lang").alias("pred"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    preds.foreach { case (exp, got) => assert(got === exp) }
  }

  test("scrub masks emails and URLs; repetition ratio flags spam") {
    val df = Seq(
      (0L, "contact me at jane.doe+x@example.co.uk or https://foo.bar/baz?q=1 thanks"),
      (1L, "buy buy buy buy buy now")).toDF("doc_id", "text")
    val scrubbed = df.select(TextAnalysis.scrub(col("text"))).collect().map(_.getString(0))
    assert(scrubbed(0) === "contact me at <EMAIL> or <URL> thanks")
    val rep = df.select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("text")).alias("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(1L) === 5.0 / 6.0)
    assert(rep(0L) < 0.2)
  }

  test("token counting: whitespace vs BPE-ish") {
    val df = Seq(Tuple1("don't stop! go-go 42")).toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeishTokenCount(col("text"))).head()
    assert(r.getInt(0) === 4)
    // don | ' | t | stop | ! | go | - | go | 42
    assert(r.getInt(1) === 9)
  }

  test("multimodal: stub decode deterministic, features bounded, frame sampling strides") {
    implicit val s = spark
    val media = Multimodal.mediaTable(
      docs.withColumn("source", lit("src")), "doc_id", "text", "source")
      .as[Multimodal.MediaItem]
    val dec = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    assert(dec.length === 4)
    assert(dec.forall(_.ok))
    val d0 = dec.head
    val n = docs.filter(col("doc_id") === 0).head().getString(1).length
    assert(d0.width === 256 + n % 1024)
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.forall(_.features.length === 16))
    // slots are integer byte-sums (order-free, f32-exact) — pin the math
    // the ext_mm_features oracle recomputes from staged bytes
    val f0 = feats.find(_.media_id == 0).get.features
    val payload0 =
      docs.filter(col("doc_id") === 0).head().getString(1).getBytes("UTF-8")
    val expect0 = payload0.indices
      .groupBy(_ % 16)
      .map { case (slot, idxs) =>
        slot -> idxs.map(i => (payload0(i) & 0xff).toLong).sum
      }
    assert((0 until 16).forall(i => f0(i) === expect0.getOrElse(i, 0L).toFloat))
    val frames = Multimodal.sampleFrames(Multimodal.decodeAll(media), stride = 10)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx"))
  }

  test("a second MediaCodec slots into decode/features without plan changes") {
    implicit val s = spark
    val media = Multimodal.mediaTable(
      docs.withColumn("source", lit("src")), "doc_id", "text", "source")
      .as[Multimodal.MediaItem]
    val dec = Multimodal.decodeAll(media, ExtSpec.FixedCodec).collect()
    assert(dec.nonEmpty)
    assert(dec.filter(_.kind != "image").forall(d =>
      d.width === 640 && d.height === 480 && d.n_frames === 24))
    assert(dec.filter(_.kind == "image").forall(_.n_frames === 1))
    val feats =
      Multimodal.extractFeatures(media, dim = 4, codec = ExtSpec.FixedCodec)
        .collect()
    assert(feats.forall(_.features.toSeq === Seq(1f, 2f, 3f, 4f)))
    assert(ExtSpec.FixedCodec.initialized.get() > 0,
      "codec.init() never ran — per-partition resolution broken")
  }
}

object ExtSpec {
  /** Stand-in "real" codec: fixed decode metadata, ramp features, and an
    * init() counter proving per-partition initialization actually fires. */
  object FixedCodec extends graft.ext.Multimodal.MediaCodec {
    val initialized = new java.util.concurrent.atomic.AtomicInteger(0)
    override def init(): Unit = { initialized.incrementAndGet(); () }
    def decode(payload: Array[Byte]): (Int, Int, Int) = (640, 480, 24)
    def features(payload: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(i => (i + 1).toFloat)
  }
}
