package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-tool main (VERDICT r6 item 9): probe the five slowest catalog data
  * paths at ~sf1.0 — 10× the largest generated testdata — and record the
  * scaling ratio in PERF.md. Anything super-linear past shuffle noise is a
  * scale bug to chase.
  *
  * No sf1.0 testdata exists, so the probe synthesizes it from sf0.1 with
  * 10× replication that deliberately BREAKS cross-replica similarity —
  * naive duplication would make every doc a 10-way near-dup family and
  * blow candidate pairs up quadratically, measuring the data not the
  * algorithm:
  *   - documents: replica i>0 gets a deterministic hash-shuffled token
  *     order (new 3-gram shingles → not a near-dup of its source);
  *   - embeddings: per-element deterministic jitter (≫ cosine-dup
  *     threshold);
  *   - events: user/event ids shifted per replica (join keys stay
  *     power-law within a replica, state scales linearly).
  * Replica 0 is byte-identical to sf0.1, so within-replica duplicate
  * structure is preserved at 10× volume.
  */
object ScaleProbe {

  private val Sf01 = "/root/testdata/sf0.1"
  private val Sf1 = "/tmp/graft_sf1"

  /** write df as the single-file table layout Tables.load expects. */
  private def writeSingle(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/_build_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    Files.move(src, Paths.get(s"$dir/$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def synthesize(spark: SparkSession): Unit = {
    if (Files.exists(Paths.get(s"$Sf1/events.parquet"))) return
    Files.createDirectories(Paths.get(Sf1))

    val docs = spark.read.parquet(s"$Sf01/documents.parquet")
    val docReplicas = (0 until 10).map { i =>
      if (i == 0) docs
      else {
        // deterministic per-replica token permutation: order tokens by
        // xxhash64(token, position, replica) — adjacency (and therefore
        // the shingle set) is destroyed, token multiset preserved
        val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
        val shuffled = concat_ws(" ", transform(array_sort(
          transform(toks, (t, p) =>
            struct(xxhash64(t, p, lit(i)).alias("h"), t.alias("t")))),
          e => e.getField("t")))
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", shuffled)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }
    writeSingle(docReplicas.reduce(_ unionByName _), Sf1, "documents")

    val emb = spark.read.parquet(s"$Sf01/embeddings.parquet")
    val embReplicas = (0 until 10).map { i =>
      if (i == 0) emb
      else emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .withColumn("embedding", transform(col("embedding"), (x, j) =>
          (x * (lit(1.0) + pmod(xxhash64(lit(i), j), lit(97)).cast("double")
            / lit(200.0))).cast("float")))
    }
    writeSingle(embReplicas.reduce(_ unionByName _), Sf1, "embeddings")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$Sf01/events.parquet") // ts stays raw long
    val evReplicas = (0 until 10).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
    }
    writeSingle(evReplicas.reduce(_ unionByName _), Sf1, "events")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.referenceSemantics(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.SessionizeTws.configure(spark)

    synthesize(spark)

    val paths = Seq(
      "ext_contamination", "ext_contamination_hashed",
      "ext_dedup_minhash_lsh", "ext_dedup_components",
      "ext_sim_topk_ivf", "st3_stream_stream_join")
    def time(name: String, dir: String): Double = {
      val s0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }
    // JVM warmup on the small scale, discarded
    time(paths.head, Sf01)
    val rows = paths.map { n =>
      val t01 = time(n, Sf01)
      val t1 = time(n, Sf1)
      (n, t01, t1, t1 / t01)
    }
    println("name,sf0.1_sec,sf1_sec,ratio")
    rows.foreach { case (n, a, b, r) =>
      println(f"$n,$a%.2f,$b%.2f,$r%.1fx")
    }
    Graft.shutdown(spark)
  }
}
