package graft

import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, OpqIndex, PqIndex, Similarity}
import graft.functions.GraftFunctions

/** ANN recall on a CLUSTERED, ANISOTROPIC corpus — the regime 100 TB
  * embedding corpora actually live in (VERDICT r14 item 5). The uniform
  * -random testdata embeddings provably cap PQ/OPQ near 0.5 and hide
  * the trained rotation's gain (PqSpec/OpqSpec document the cap); this
  * fixture has the two structures real corpora have:
  *   - CLUSTERS: a seeded mixture of Gaussians (IVF's coarse cells
  *     align with them, so probing a few cells recovers neighbors);
  *   - ANISOTROPY: points live near a low-dimensional latent subspace
  *     spread across all 64 coordinates (a fixed random projection), so
  *     PQ's fixed coordinate slices each quantize correlated marginals
  *     while OPQ's TRAINED rotation (PCA + balanced eigenvalue
  *     allocation, Ge et al. 2013 §4) concentrates and re-deals the
  *     variance — the regime where rotation is a measured WIN, not a
  *     wash.
  * Every generator is seeded; the gates are measured-margin floors plus
  * the ordering invariants (OPQ > PQ, clustered IVF above its uniform
  * floor) that must hold wherever the exact numbers drift. */
class AnnClusteredRecallSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val Dim = 64
  private val Latent = 8
  private val NClusters = 16
  private val N = 2000

  /** Seeded mixture of Gaussians in an 8-dim latent space, projected to
    * 64 dims by one fixed Gaussian matrix + small ambient noise. */
  private lazy val emb: org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(1234L)
    val proj = Array.fill(Latent, Dim)(rnd.nextGaussian())
    val centroids = Array.fill(NClusters, Latent)(rnd.nextGaussian() * 2.0)
    val rows = (0 until N).map { i =>
      val c = centroids(i % NClusters)
      val z = c.map(_ + rnd.nextGaussian() * 0.5)
      val v = Array.tabulate(Dim) { d =>
        var s = 0.0
        var l = 0
        while (l < Latent) { s += z(l) * proj(l)(d); l += 1 }
        (s + rnd.nextGaussian() * 0.05).toFloat
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").repartition(8).cache()
  }

  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact =
    pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))

  test("IVF on clustered data: cells align with clusters, recall well above the uniform floor") {
    val ivf = pairs(IvfIndex.topK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"clustered ivf recall@5 = $recall%.2f")
    // measured 1.00 on this seed; the uniform-embedding floor is 0.84
    // (IvfSpec) — clustered data is WHY inverted files work
    assert(recall >= 0.95, s"recall@5 = $recall")
    assert(exact.size === 100)
  }

  test("filtered ANN: predicate pre-filter + widened probes keep recall") {
    // metadata filter: ~20% of the corpus qualifies (vec_id % 5 = 1) —
    // the "top-k similar WHERE lang = 'en'" serving shape
    val labeled = emb.withColumn("label", pmod(col("vec_id"), lit(5)))
    val corpus = labeled.filter(col("label") === 1)
    // ground truth: brute force over the QUALIFYING corpus only
    val exactFiltered = pairs(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k = 5))
    val model = IvfIndex.train(emb, "embedding", nCells = 16, seed = 7L)
    val cands = IvfIndex.candidates(emb, queries, "vec_id", "embedding",
      model, nProbe = 8) // widened vs the unfiltered 4 — the filter
                         // removes ~80% of each cell's survivors
    val filtered = cands
      .join(labeled.select(col("vec_id").alias("n_id"), col("label")), "n_id")
      .filter(col("label") === 1).select("q_id", "n_id")
    val got = Similarity.topKFromCandidates(filtered, queries
      .select(col("vec_id").alias("id"), col("embedding").alias("vec")),
      emb.select(col("vec_id").alias("id"), col("embedding").alias("vec")),
      k = 5)
    val gotPairs = pairs(got)
    // every served neighbor satisfies the predicate
    assert(gotPairs.forall { case (_, n) => n % 5 == 1 },
      "the filter must hold on every served row")
    val recall = (exactFiltered & gotPairs).size.toDouble / exactFiltered.size
    info(f"filtered ivf recall@5 = $recall%.2f")
    assert(recall >= 0.85, s"filtered recall@5 = $recall")
  }

  test("IVF-PQ residual encoding beats plain PQ at equal code bytes") {
    // same code budget (m=8, nCodes=16 → 8 bytes/vector) and the same
    // shortlist budget; the ONLY change is quantizing residuals instead
    // of absolute vectors. On a clustered corpus residuals concentrate
    // near the origin (the cell centroid absorbs the cluster offset), so
    // the same codebook resolution covers a far smaller dynamic range —
    // the gate is the ordering, the floor is measured-margin.
    val pq = pairs(PqIndex.topK(emb, queries, "vec_id", "embedding",
      dim = Dim, k = 5, shortlistFactor = 8, corpusKey = "clustered#pq"))
    val pqRecall = (exact & pq).size.toDouble / exact.size

    val ivfpq = pairs(graft.ext.IvfPq.topK(emb, queries, "vec_id",
      "embedding", dim = Dim, k = 5, nCells = 16, nProbe = 4,
      shortlistFactor = 8, corpusKey = "clustered#ivfpq"))
    val ivfpqRecall = (exact & ivfpq).size.toDouble / exact.size

    info(f"clustered pq recall@5 = $pqRecall%.2f, ivf-pq recall@5 = $ivfpqRecall%.2f")
    assert(ivfpqRecall >= pqRecall + 0.05,
      f"residual encoding must gain a real margin at equal bytes: " +
        f"pq=$pqRecall%.2f ivfpq=$ivfpqRecall%.2f")
    assert(ivfpqRecall >= 0.5, s"ivf-pq recall@5 = $ivfpqRecall")
  }

  test("trained-rotation OPQ beats plain PQ on anisotropic data") {
    // same shortlist budget for both (8k of 2000 = 2% of the corpus
    // reranked exactly — the production-shaped setting; at factor 4 the
    // ordering is the same, both recalls just sit lower)
    val pq = pairs(PqIndex.topK(emb, queries, "vec_id", "embedding",
      dim = Dim, k = 5, shortlistFactor = 8, corpusKey = "clustered#pq"))
    val pqRecall = (exact & pq).size.toDouble / exact.size

    val r = OpqIndex.trainedRotation(emb, "embedding", dim = Dim, m = 8)
    val rot = emb.select(col("vec_id"),
      OpqIndex.rotate(col("embedding"), r).alias("rvec")).cache()
    val opq = pairs(PqIndex.topK(rot, rot.filter(col("vec_id") < 20),
      "vec_id", "rvec", dim = Dim, k = 5, shortlistFactor = 8,
      corpusKey = "clustered#opq"))
    val opqRecall = (exact & opq).size.toDouble / exact.size

    info(f"clustered pq recall@5 = $pqRecall%.2f, opq recall@5 = $opqRecall%.2f")
    // THE gate is the ordering: on anisotropic data the trained rotation
    // must GAIN, not merely cost nothing (the uniform fixture can only
    // pin the latter — PqSpec/OpqSpec document that cap). Anisotropy is
    // also exactly what makes the fixture HARD for 8-byte codes: the
    // neighbor-deciding variance lives in an 8-dim latent spread over
    // all 64 coordinates, so plain PQ's coordinate slices are nearly
    // blind to it — that near-blindness is what the rotation repairs.
    // Absolute floors are measured-margin on this fixed seed.
    assert(opqRecall >= pqRecall + 0.05,
      f"the rotation's gain must be a real margin: pq=$pqRecall%.2f opq=$opqRecall%.2f")
    // measured 0.42 / 0.55 on this seed (deterministic); floors with margin
    assert(pqRecall >= 0.3, s"pq recall@5 = $pqRecall")
    assert(opqRecall >= 0.45, s"opq recall@5 = $opqRecall")
  }
}
