package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dataset-assembly operators a training-data pipeline needs downstream of
  * cleaning/dedup: deterministic split assignment, token-budget packing,
  * and benchmark-contamination detection (SURVEY.md §7.5 extension tier).
  */
object PipelineOps {

  /** Deterministic train/val/test assignment from a content-stable hash of
    * the id — re-running on a grown corpus never moves an old row between
    * splits (a `rand()` split reshuffles on every change and leaks val
    * into train). md5's first 4 hex digits are uniform on [0, 65536); each
    * split owns the lexicographic hex interval proportional to its
    * weight. Pure per-row expression: no shuffle, no state. */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val cases = weights.map(_._1).zip(splitBoundsHex(weights)).dropRight(1)
      .foldRight(lit(weights.last._1): org.apache.spark.sql.Column) {
        case ((name, bound), rest) => when(h < lit(bound), name).otherwise(rest)
      }
    df.withColumn("split", cases)
  }

  /** Hex thresholds for [[assignSplit]]'s oracle SQL — the single source
    * the Spark when-chain also builds from (a divergent reimplementation
    * would silently split engine vs oracle). */
  def splitBoundsHex(weights: Seq[(String, Double)]): Seq[String] =
    weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail.map(rateHex)

  /** A keep rate as the 4-hex-digit md5-prefix threshold below which rows
    * are kept. rate ≥ 1 returns "g" — lexicographically above every hex
    * string, so keep-everything really keeps the 'ffff' prefixes too. */
  def rateHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max((rate * 65536).round, 0L)}%04x"

  /** Deterministic stratified sampling: per-stratum rates applied through
    * the same md5-prefix interval trick as [[assignSplit]] — `sampleBy`
    * semantics without `rand()`, so reruns and corpus growth keep every
    * previously-sampled row. Scan-side filter, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val thr = rates.foldLeft(lit(rateHex(defaultRate))) {
      case (acc, (k, r)) => when(col(strataCol) === k, rateHex(r)).otherwise(acc)
    }
    df.filter(h < thr)
  }

  /** Token-budget chunk packing, the SQL-shaped variant: rows ordered by
    * `orderCol` within each `groupCol` are assigned
    * `pack_id = prior_cumulative_weight DIV budget`. A document can
    * straddle a budget boundary by less than its own weight (fixed-budget
    * chunking with overflow tolerance); [[greedyPack]] is the exact
    * no-straddle variant. One hash shuffle on the group key; per-group
    * window state is a running sum. */
  def budgetPack(df: DataFrame, groupCol: String, orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("pack_id", expr(s"CAST(_cum DIV $budget AS INT)"))
      .drop("_cum")
  }

  /** Materialize pack texts from a [[budgetPack]]/[[greedyPack]] output:
    * one row per (group, pack_id) with the member docs concatenated in
    * `orderCol` order. `array_sort(collect_list(struct(ord, text)))`
    * makes the concatenation deterministic regardless of partition
    * arrival order; per-pack state is bounded by the token budget. */
  def concatPacks(packed: DataFrame, groupCol: String, orderCol: String,
      textCol: String, sep: String = " "): DataFrame =
    packed.groupBy(groupCol, "pack_id").agg(
      count(lit(1)).alias("n_docs"),
      array_join(
        transform(
          array_sort(collect_list(struct(col(orderCol).alias("o"),
            col(textCol).alias("t")))),
          _.getField("t")),
        sep).alias("pack_text"))

  // not private: Catalyst's generated deserializer needs public access
  case class PackRow(group: String, ord: Long, weight: Long)

  /** Exact greedy packing: fill each pack until adding the next row would
    * exceed `budget`, then start a new pack (an over-budget single row
    * gets its own pack). Stateful and non-associative, so it runs as a
    * typed mapGroups per group key — the same bounded-state shape as
    * sessionization. Returns (groupCol, orderCol, pack_id). */
  def greedyPack(df: DataFrame, groupCol: String, orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").alias("group"),
        col(orderCol).cast("long").alias("ord"),
        col(weightCol).cast("long").alias("weight"))
      .as[PackRow](Encoders.product[PackRow])
      .groupByKey(_.group)
      .flatMapGroups { (g, it) =>
        val sorted = it.toArray.sortBy(_.ord)
        var pack = 0L
        var fill = 0L
        sorted.iterator.map { r =>
          if (fill > 0 && fill + r.weight > budget) { pack += 1; fill = 0 }
          fill += r.weight
          (g, r.ord, pack)
        }
      }
      .toDF(groupCol, orderCol, "pack_id")
  }

  /** Corpus-version diff — the dataset-versioning primitive: classify
    * every id across two snapshots as `added` (v2 only), `removed`
    * (v1 only), `changed` (both, content hash differs), or `unchanged`.
    * The audit that runs between corpus releases, and the input to an
    * incremental re-processing pass (only `added`/`changed` docs need
    * re-cleaning/re-embedding).
    *
    * One full-outer hash join on the id, carrying only (id, 16-byte
    * content hash) per side — the text itself never moves. At 100 TB
    * store both snapshots bucketed by id and even that shuffle
    * disappears ([[graft.ext.Dedup.minhashBandTable]]'s bucketing
    * argument, proven in `IncrementalDedupSpec`). */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence flags, not hash-nullness: a present row with NULL text
    // must not classify as absent, and NULL-vs-text must read as changed
    // (null-safe <=> / IS DISTINCT FROM on both engines)
    def side(df: DataFrame, h: String, p: String) = df.select(col(idCol),
      md5(col(textCol)).alias(h), lit(true).alias(p))
    side(v1, "_h1", "_p1").join(side(v2, "_h2", "_p2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_p1").isNull, "added")
          .when(col("_p2").isNull, "removed")
          .when(!(col("_h1") <=> col("_h2")), "changed")
          .otherwise("unchanged").alias("status"))
  }

  /** Deterministic count-based sampling: the `k` rows per group with the
    * smallest md5(id) — "k random-looking docs per source" without
    * `rand()`, so reruns agree bit-for-bit (eval-set carving, per-domain
    * inspection samples). Complements [[stratifiedSample]] (rate-based):
    * a count cap bounds every group regardless of its size.
    *
    * Drives the custom [[graft.ops.TopK]] operator: one hash shuffle on
    * the group key, then bounded per-key heaps — rows that can never rank
    * are dropped on the stream, where the window `row_number` form sorts
    * every row of every partition first. */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    val withH = df.withColumn("_h", md5(col(idCol).cast("string")))
    graft.ops.TopK.perKey(withH, Seq(groupCol),
      Seq(("_h", true), (idCol, true)), k).drop("_h")
  }

  /** One-pass column profiling — the ANALYZE/monitoring surface of a
    * pipeline: per column, row count, non-null count, exact distinct
    * count, and min/max (as strings, so heterogeneous columns share one
    * schema). All columns profile in a SINGLE aggregation job: Catalyst
    * plans the multi-distinct via one Expand (rows × |cols| in the map
    * stage, partial-aggregated before the one shuffle), not one job per
    * column — at 100 TB that is one corpus scan instead of |cols|.
    * Exact distincts are the honest profiling default; swap in
    * `approx_count_distinct` (see a6) when ±2% is acceptable and the
    * Expand multiplier hurts.
    *
    * Avoid double columns here: min/max stringification is not
    * cross-engine-stable for floats (profile them via exact casts).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).alias(s"_nn_$c"),
      count_distinct(col(c)).alias(s"_nd_$c"),
      min(col(c)).cast("string").alias(s"_mn_$c"),
      max(col(c)).cast("string").alias(s"_mx_$c"))) :+
      count(lit(1)).alias("_n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).alias("column"),
        col("_n_rows").alias("n_rows"),
        col(s"_nn_$c").alias("n_nonnull"),
        col(s"_nd_$c").alias("n_distinct"),
        col(s"_mn_$c").alias("min_val"),
        col(s"_mx_$c").alias("max_val"))): _*)).alias("p"))
      .select("p.*")
  }

  /** Sliding token-window chunking — the context-window preparation step
    * between cleaning and packing: each document becomes
    * `ceil((n - chunkSize) / stride) + 1` chunks (one chunk when
    * `n <= chunkSize`), chunk i covering tokens
    * `[i·stride, i·stride + chunkSize)`. `stride < chunkSize` gives
    * overlapping windows (the standard LM training shape, so no token is
    * only ever seen truncated at a boundary); `stride == chunkSize` tiles.
    *
    * Pure per-row generate: tokens are materialized once per document,
    * chunks are slices of that one array — no shuffle, no state, and the
    * output inherits the input's partitioning. At 100 TB this is a
    * scan-side map whose output is ~`1 + overlap` × input bytes; the
    * expansion factor is the only dial that matters.
    *
    * @return (idCol, chunk_idx, n_chunk_tokens, chunk_text)
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val n = size(col("_toks"))
    // integral ceil-div: Column `/` is double division, floor() restores
    // the exact integer for any corpus-realistic magnitude (< 2^52)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      floor((n - chunkSize + stride - 1) / lit(stride)).cast("int") + 1)
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).alias("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(col("_toks"), i * stride + 1, lit(chunkSize)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx"),
        greatest(least(lit(chunkSize), n - col("chunk_idx") * stride), lit(0))
          .alias("n_chunk_tokens"),
        col("chunk_text"))
  }

  /** Benchmark-contamination check: for each corpus document, the fraction
    * of its distinct word `n`-gram shingles that appear anywhere in the
    * benchmark set (the decontamination pass run before training on any
    * corpus that may contain eval data). Returns only contaminated docs
    * (ratio > 0).
    *
    * Shape: explode distinct shingles on both sides, equi-join on the
    * shingle, count per doc — the benchmark side is DISTINCT'd and small
    * (eval sets are thousands of docs), so Catalyst broadcasts it and the
    * corpus side never shuffles its shingles. At corpus scale, swap the
    * shingle strings for xxhash64 of the shingle (same join, 8-byte keys)
    * — kept as strings here so the DuckDB oracle can recompute them. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // ONE shingle pass over the corpus: explode the distinct-shingle
    // array (computed once per document by the Generate's child
    // projection), LEFT-join the broadcast benchmark set to tag hits,
    // then a single per-doc aggregate derives BOTH counts from the same
    // exploded stream — n_total = count(*) (= the set's size, since the
    // array was distinct'd), n_shared = count(_hit). This replaces the
    // old two-branch shape (a second full shingle pass for size() plus a
    // per-doc totals join) with zero extra scans and zero extra joins;
    // the per-doc agg is partially aggregable so nothing wider than the
    // shingle itself shuffles. Docs sharing nothing are filtered (the
    // contract: return only contaminated docs), which the old inner
    // shared-join also enforced.
    val corpusSh = corpus.select(col(idCol),
      explode(array_distinct(Dedup.shingles(col(textCol), n))).alias("_sh"))
    val benchSh = benchmark
      .select(explode(array_distinct(Dedup.shingles(col(textCol), n))).alias("_sh"))
      .distinct()
      .withColumn("_hit", lit(1))
    corpusSh.join(broadcast(benchSh), Seq("_sh"), "left")
      .groupBy(idCol)
      .agg(count(col("_hit")).alias("n_shared"),
        count(lit(1)).alias("n_total"))
      .filter(col("n_shared") > 0)
      .select(col(idCol), col("n_shared"), col("n_total"),
        (col("n_shared").cast(DoubleType) / col("n_total").cast(DoubleType))
          .alias("contamination"))
  }

  /** Cross-document duplicated n-token spans — the corpus-internal
    * counterpart of [[contamination]] (which screens against an external
    * benchmark): for every document, how many of its distinct n-token
    * spans also appear in at least one OTHER document. High dup_ratio
    * flags boilerplate/templated text that exact- and MinHash-dedup both
    * miss (the documents differ globally but share long verbatim runs) —
    * the span-level signal behind suffix-array substring dedup, at n-gram
    * granularity so it stays a pair of hash-partitioned aggregates.
    *
    * Shape: (doc, span) distinct pairs shuffle once on the span to count
    * carriers; spans with ≥2 carriers join back (shuffle reuse on the
    * span key — no new exchange) and a per-doc count closes it. Nothing
    * driver-side, no all-pairs anything. At corpus scale spans travel as
    * xxhash64 (8-byte keys, same plan); strings here keep the DuckDB
    * oracle able to recompute them. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    // spans ride as 8-byte rolling HASHES, not n-word strings: the span is
    // both a group-by key and a join key here, so the string form shuffled
    // ~40 bytes/span twice — the single largest constant in the catalog
    // (8.4 s at sf0.1). Counts are hash-collision-exact to 2^-64 and the
    // oracle recomputes from the raw text either way. Empty-token docs
    // keep their single whole-doc span (hash 0), matching the string
    // form's [""] so per-doc totals stay oracle-identical.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sets = docs
      .select(col(idCol), Dedup.shingleHashes(col(textCol), n).alias("_h"))
      .select(col(idCol), array_distinct(
        when(size(col("_h")) === 0, array(lit(0L)))
          .otherwise(col("_h"))).alias("_sps"))
    val spans = sets.select(col(idCol), explode(col("_sps")).alias("_sp"))
    val dup = spans.groupBy("_sp")
      .agg(count(lit(1)).alias("_carriers"))
      .filter(col("_carriers") > 1)
      .select("_sp")
    val perDoc = spans.join(dup, Seq("_sp"))
      .groupBy(idCol).agg(count(lit(1)).alias("n_dup"))
    val totals = sets.select(col(idCol), size(col("_sps")).alias("n_spans"))
    perDoc.join(totals, Seq(idCol))
      .select(col(idCol), col("n_dup"), col("n_spans"),
        (col("n_dup").cast(DoubleType) / col("n_spans").cast(DoubleType))
          .alias("dup_ratio"))
  }

  /** Per-doc distinct shingle HASHES: the corpus-scale contamination input.
    * One xxhash64 per token + the native rolling n-gram combiner
    * ([[Dedup.shingleHashes]]) — no shingle strings are ever allocated,
    * and the exploded row carries 8 bytes instead of an ~n-word string.
    * Requires [[graft.functions.GraftFunctions.register]]. */
  def shingleHashSet(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(Dedup.shingleHashes(col(textCol), n))).alias("h"))

  /** Contamination over pre-hashed shingle sets — the 100 TB shape of
    * [[contamination]]: the benchmark side collapses to a broadcast set of
    * 8-byte hashes, the corpus side streams (id, hash) rows through a
    * broadcast semi-join and two per-doc counts; nothing wider than
    * 16 bytes ever shuffles. A 64-bit hash collision needs ~2^32 distinct
    * shingles per doc to matter (birthday bound) — immaterial, and both
    * engines see identical hashes so the check is unaffected. */
  def contaminationFromHashes(corpusHashes: DataFrame,
      benchHashes: DataFrame, idCol: String): DataFrame =
    // Same one-pass shape as [[contamination]]: broadcast LEFT join tags
    // hits, one per-doc aggregate yields both counts — the corpus hash
    // stream is scanned once instead of twice.
    corpusHashes
      .join(broadcast(benchHashes.select("h").distinct()
        .withColumn("_hit", lit(1))), Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(col("_hit")).alias("n_shared"),
        count(lit(1)).alias("n_total"))
      .filter(col("n_shared") > 0)
      .select(col(idCol), col("n_shared"), col("n_total"),
        (col("n_shared").cast(DoubleType) / col("n_total").cast(DoubleType))
          .alias("contamination"))

  /** Per-source keep rates for temperature-weighted corpus mixing — the
    * data-mixing stage of a training pipeline: source s with total weight
    * (token count) T_s gets share w_s = T_s^α / Σ T_s^α of a token budget
    * `budgetFrac × Σ T_s`, i.e. keep rate min(1, budget·w_s / T_s).
    * α = 1 keeps every source at exactly `budgetFrac` (proportional);
    * α = 0 splits the budget evenly across sources; 0 < α < 1 upsamples
    * small sources relative to proportional — the standard dial for
    * low-resource language/domain balance.
    *
    * Driver-side scalar computation over ONE ROW PER SOURCE (the same
    * sanctioned shape as the reference's mean-imputation collect): the
    * rates become literals/broadcast rows, so applying the mix is a pure
    * scan-side filter with no shuffle — at 100 TB the mixing decision
    * costs one aggregation pass, the application costs zero. */
  def temperatureRates(df: DataFrame, sourceCol: String, weightCol: String,
      alpha: Double = 0.5, budgetFrac: Double = 0.4): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    val totals = df.groupBy(sourceCol)
      .agg(sum(col(weightCol)).alias("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val budget = budgetFrac * totals.values.sum
    val wSum = totals.values.map(math.pow(_, alpha)).sum
    totals.map { case (s, t) =>
      s -> math.min(1.0, budget * math.pow(t, alpha) / wSum / t)
    }
  }

  /** Apply precomputed mixing rates deterministically: the same
    * md5-interval trick as [[stratifiedSample]], so re-mixing a grown
    * corpus never drops a previously-kept row of an unchanged source. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double]): DataFrame =
    stratifiedSample(df, idCol, sourceCol, rates, defaultRate = 0.0)

  /** [[contaminationFromHashes]] over freshly hashed corpus + benchmark. */
  def contaminationHashed(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    contaminationFromHashes(
      shingleHashSet(corpus, idCol, textCol, n),
      shingleHashSet(benchmark, idCol, textCol, n).select("h"), idCol)
  }
}
