package graft.ops

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{PipelineOps, TextAnalysis}

/** Dataset-assembly catalog (extension tier, SURVEY.md §7.5): the
  * operators that turn a cleaned/deduped corpus into training data —
  * as-of enrichment, bloom-pruned filtering, split assignment, packing,
  * decontamination. All fully oracle-checked (DuckDB has native ASOF
  * JOIN; md5 and the window arithmetic are engine-identical).
  */
object PipelineQueries {

  private val SPLITS = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("ext_asof_join",
      "as-of backward join: latest order at/before each event date per user (union-merge, one shuffle — no range explosion)",
      """WITH r AS (SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS last_price
        |           FROM orders GROUP BY o_custkey, o_orderdate),
        |l AS (SELECT event_id, user_id, CAST(ts AS DATE) AS event_date FROM events)
        |SELECT l.event_id, l.user_id, l.event_date,
        |  r.o_orderdate AS asof_date, r.last_price
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.o_custkey AND l.event_date >= r.o_orderdate""".stripMargin) { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          to_date(col("ts")).alias("event_date"))
      // uniquify right per (key, ts) so as-of tie-handling is deterministic
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).alias("last_price"))
      AsofJoin.asofBackward(events, "user_id", "event_date",
        orders, "o_custkey", "o_orderdate", Seq("last_price"),
        asofTsCol = "asof_date")
    },

    QueryDef("ext_bloom_semi",
      "bloom-prefiltered semi-join: orders of BUILDING-segment customers (bloom prunes scan-side, exact verify on survivors)",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      BloomSemi.semiJoin(orders, cust, "o_custkey", "c_custkey")
    },

    QueryDef("ext_split_assign",
      "deterministic content-hash train/val/test split (80/10/10, stable across corpus growth)", {
      val Seq(b1, b2) = PipelineOps.splitBoundsHex(SPLITS).dropRight(1)
      s"""SELECT doc_id, lang,
         |  CASE WHEN h < '$b1' THEN 'train' WHEN h < '$b2' THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h FROM documents)""".stripMargin
    }) { (s, dir) =>
      PipelineOps.assignSplit(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", SPLITS)
    },

    QueryDef("ext_pack_budget",
      "token-budget chunk packing: pack_id per doc (512-token budget, per-lang, doc_id order)",
      """WITH t AS (SELECT doc_id, lang,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_toks FROM documents),
        |c AS (SELECT doc_id, lang, n_toks,
        |  SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_toks AS prior FROM t)
        |SELECT doc_id, lang, n_toks, CAST(prior // 512 AS INT) AS pack_id FROM c""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"),
        col("lang"), TextAnalysis.tokenCount(col("text")).alias("n_toks"))
      PipelineOps.budgetPack(docs, "lang", "doc_id", "n_toks", 512)
    },

    QueryDef("ext_pack_concat",
      "materialized training sequences: docs concatenated per (lang, pack_id) in doc order",
      """WITH t AS (SELECT doc_id, lang, text,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_toks FROM documents),
        |c AS (SELECT doc_id, lang, text,
        |  CAST((SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_toks) // 512 AS INT) AS pack_id FROM t)
        |SELECT lang, pack_id, COUNT(*) AS n_docs,
        |  array_to_string(list_transform(list_sort(list(struct_pack(o := doc_id, t := text))), x -> x.t), ' ') AS pack_text
        |FROM c GROUP BY lang, pack_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"),
        col("lang"), col("text"),
        TextAnalysis.tokenCount(col("text")).alias("n_toks"))
      PipelineOps.concatPacks(
        PipelineOps.budgetPack(docs, "lang", "doc_id", "n_toks", 512),
        "lang", "doc_id", "text")
    },

    // The flagship composition: every stage is an already-oracled
    // operator, chained the way a real corpus-prep run chains them —
    // proof the pieces compose end-to-end, checked as ONE cross-engine
    // query (quality gate → exact dedup → deterministic split → report).
    QueryDef("ext_pipeline_e2e",
      "end-to-end corpus prep: quality gate (>= 0.5) → exact content-hash dedup (min doc_id wins; text never shuffles) → 80/10/10 split → per-(split, lang) doc/token report", {
      val Seq(b1, b2) = PipelineOps.splitBoundsHex(SPLITS).dropRight(1)
      s"""WITH q AS (SELECT doc_id, lang, text,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS DOUBLE) AS n_toks,
         |  CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) AS punct
         |FROM documents),
         |g AS (SELECT doc_id, lang, md5(text) AS doc_hash, CAST(n_toks AS BIGINT) AS n_toks FROM q
         |      WHERE (CASE WHEN n_toks < 5 THEN n_toks / 5.0 WHEN n_toks > 10000 THEN 0.5 ELSE 1.0 END)
         |        * (CASE WHEN punct > 0.3 THEN 0.3 ELSE 1.0 END) >= 0.5),
         |c AS (SELECT doc_hash, MIN(doc_id) AS doc_id FROM g GROUP BY doc_hash),
         |d AS (SELECT g.* FROM g JOIN c ON g.doc_hash = c.doc_hash AND g.doc_id = c.doc_id),
         |s AS (SELECT lang, n_toks,
         |  CASE WHEN h < '$b1' THEN 'train' WHEN h < '$b2' THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT lang, n_toks, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h FROM d))
         |SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |FROM s GROUP BY split, lang""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // dedup key is a 16-byte content hash, not the text: at corpus
      // scale the wide text column must never ride the dedup shuffle
      val gated = docs
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        .select(col("doc_id"), col("lang"), md5(col("text")).alias("doc_hash"),
          TextAnalysis.tokenCount(col("text")).cast("long").alias("n_toks"))
      val dedup = gated.join(
        gated.groupBy("doc_hash").agg(min("doc_id").alias("doc_id")),
        Seq("doc_hash", "doc_id"))
      PipelineOps.assignSplit(dedup, "doc_id", SPLITS)
        .groupBy("split", "lang")
        .agg(count(lit(1)).alias("n_docs"), sum("n_toks").alias("n_tokens"))
    },

    // Two "versions" are carved deterministically from one table (v1 =
    // doc_id < 450; v2 = doc_id >= 50 with every 7th text revised), so
    // both engines construct identical snapshots and the full-outer
    // diff classification is checked end to end.
    QueryDef("ext_corpus_diff",
      "corpus-version diff: added/removed/changed/unchanged by content hash across two snapshots (full-outer join on id; text never shuffles)",
      """WITH v1 AS (SELECT doc_id, md5(text) AS h, 1 AS p FROM documents WHERE doc_id < 450),
        |v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END) AS h, 1 AS p
        |       FROM documents WHERE doc_id >= 50)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.p IS NULL THEN 'added' WHEN v2.p IS NULL THEN 'removed'
        |       WHEN v1.h IS DISTINCT FROM v2.h THEN 'changed' ELSE 'unchanged' END AS status
        |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") < 450)
      val v2 = docs.filter(col("doc_id") >= 50)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
      PipelineOps.corpusDiff(v1, v2, "doc_id", "text")
    },

    QueryDef("ext_sample_per_group",
      "deterministic k-per-group sampling: 20 smallest-md5 docs per source (count-capped complement of the rate-based stratified sample; runs on the custom TopKPerKey operator)",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin) { (s, dir) =>
      PipelineOps.samplePerGroup(
        Tables.load(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", k = 20)
    },

    QueryDef("ext_profile",
      "one-pass column profiling: per-column row/non-null/exact-distinct counts and min/max (the ANALYZE surface; single aggregation job via Expand)",
      """SELECT 'doc_id' AS "column", COUNT(*) AS n_rows, COUNT(doc_id) AS n_nonnull,
        |  COUNT(DISTINCT doc_id) AS n_distinct, CAST(MIN(doc_id) AS VARCHAR) AS min_val,
        |  CAST(MAX(doc_id) AS VARCHAR) AS max_val FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(lang), COUNT(DISTINCT lang),
        |  MIN(lang), MAX(lang) FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source),
        |  MIN(source), MAX(source) FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars),
        |  CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents""".stripMargin) { (s, dir) =>
      PipelineOps.profile(Tables.load(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
    },

    // Sliding-window chunking is pure integer/slice arithmetic, so the
    // WHOLE operator is oracled — chunk counts, boundaries, and the
    // joined chunk text are recomputed bit-for-bit by DuckDB.
    QueryDef("ext_chunk_text",
      "sliding token-window chunking: 64-token windows, stride 48 (context-window preparation; fully oracled, no staging)",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS tk FROM documents),
        |c AS (SELECT doc_id, tk, len(tk) AS n,
        |  CASE WHEN len(tk) <= 64 THEN 1 ELSE CAST((len(tk) - 64 + 47) // 48 AS INT) + 1 END AS n_chunks FROM t)
        |SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |  CAST(greatest(least(64, n - u.i * 48), 0) AS INT) AS n_chunk_tokens,
        |  array_to_string(tk[u.i * 48 + 1 : u.i * 48 + 64], ' ') AS chunk_text
        |FROM c, UNNEST(range(0, n_chunks)) AS u(i)""".stripMargin) { (s, dir) =>
      PipelineOps.chunkByTokens(Tables.load(s, dir, "documents"),
        "doc_id", "text", chunkSize = 64, stride = 48)
    },

    // Unigram LM scoring: the ln() derivation is Spark-side math (staged
    // as micro-nat LONGs — see UnigramLm's determinism note), and the
    // scoring join + exact integer sum + single final division are
    // recomputed by DuckDB over the staged vocabulary. CAST(SUM AS
    // BIGINT) in the oracle: DuckDB sums BIGINT into HUGEINT, which
    // pandas renders as float64 — the round-2 dtype trap.
    QueryDef("ext_text_lm_score",
      "unigram LM quality score: micro-nat log-probs trained on doc_id < 250, mean log-prob per doc (scoring oracled over staged vocab)",
      ("""WITH tok AS (SELECT doc_id, u.t AS token
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents),
         |  UNNEST(tk) AS u(t)),
         |""" +
       s"""v AS (SELECT token, lp_micro FROM read_parquet('${QueryDef.StageSql}/lm_vocab/*.parquet')),
         |o AS (SELECT lp_micro AS oov FROM read_parquet('${QueryDef.StageSql}/lm_oov/*.parquet')),
         |""" +
       """s AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(COALESCE(v.lp_micro, o.oov)) AS BIGINT) AS lp_sum
         |  FROM tok LEFT JOIN v USING (token) CROSS JOIN o GROUP BY doc_id)
         |SELECT doc_id, n_tokens, lp_sum,
         |  CAST(lp_sum AS DOUBLE) / (n_tokens * 1e6) AS avg_lp FROM s""").stripMargin) { (s, dir) =>
      import graft.ext.UnigramLm
      val docs = Tables.load(s, dir, "documents")
      val counts = UnigramLm.unigramCounts(docs.filter(col("doc_id") < 250), "text")
      val total = UnigramLm.totalTokens(counts)
      val oov = UnigramLm.oovMicro(total)
      val stage = QueryDef.stageDir(dir)
      UnigramLm.vocab(counts, total, minCount = 2)
        .write.mode("overwrite").parquet(s"$stage/lm_vocab")
      s.createDataFrame(Seq(Tuple1(oov))).toDF("lp_micro").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/lm_oov")
      UnigramLm.score(docs, "doc_id", "text",
        s.read.parquet(s"$stage/lm_vocab"), oov)
    },

    // TF-IDF: the ln(N/df) derivation is Spark-side math staged as
    // micro-nat LONGs (UnigramLm's determinism pattern); DuckDB
    // recomputes tokenization, term frequencies, the integer score
    // product, and the per-doc top-k over the staged IDF table.
    QueryDef("ext_text_tfidf",
      "TF-IDF top-5 terms per doc: integer micro-nat IDF staged, exact tf*idf ranking on the custom TopKPerKey operator",
      ("""WITH tok AS (SELECT doc_id AS doc, u.t AS token
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents),
         |  UNNEST(tk) AS u(t)),
         |tf AS (SELECT doc, token, COUNT(*) AS tf FROM tok GROUP BY doc, token),
         |""" +
       s"""v AS (SELECT token, idf_micro FROM read_parquet('${QueryDef.StageSql}/tfidf_idf/*.parquet')),
         |""" +
       """sc AS (SELECT tf.doc, tf.token, tf.tf, tf.tf * v.idf_micro AS score
         |  FROM tf JOIN v USING (token))
         |SELECT doc, token, tf, score FROM sc
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc ORDER BY score DESC, token) <= 5""").stripMargin) { (s, dir) =>
      import graft.ext.TfIdf
      val docs = Tables.load(s, dir, "documents")
      val tok = TfIdf.tokenized(docs, "doc_id", "text")
      val stage = QueryDef.stageDir(dir)
      TfIdf.idf(tok, docs.count())
        .write.mode("overwrite").parquet(s"$stage/tfidf_idf")
      TfIdf.topTerms(TfIdf.termFreq(tok),
        s.read.parquet(s"$stage/tfidf_idf"), k = 5)
    },

    // BM25 ranked retrieval (Robertson & Zaragoza 2009): tf saturation +
    // length normalization on top of TfIdf's scan shapes. The BM25-form
    // IDF is staged as micro-nat LONGs; avgdl derives in-engine from a
    // staged one-row integer stats table; the saturation is a fixed
    // IEEE expression tree over exact integers (bit-identical across
    // engines) floored to dyadic, so per-doc sums are order-free. The
    // oracle SQL mirrors Bm25.saturation's association order EXACTLY —
    // edit them together or the last ulp diverges.
    QueryDef("ext_text_bm25",
      "BM25 scores for a 4-term query: micro-nat IDF staged, dyadic-floored saturation, exact order-free per-doc sums",
      ("""WITH tok AS (SELECT doc_id AS doc, u.t AS token
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents),
         |  UNNEST(tk) AS u(t)),
         |lens AS (SELECT doc_id AS doc,
         |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS len FROM documents),
         |""" +
       s"""v AS (SELECT token, idf_micro FROM read_parquet('${QueryDef.StageSql}/bm25_idf/*.parquet')),
         |st AS (SELECT CAST(total_toks AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
         |  FROM read_parquet('${QueryDef.StageSql}/bm25_stats/*.parquet')),
         |""" +
       """tf AS (SELECT doc, token, COUNT(*) AS tf FROM tok JOIN v USING (token) GROUP BY 1, 2),
         |sc AS (SELECT tf.doc, v.idf_micro * (floor(
         |    ((CAST(tf.tf AS DOUBLE) * 2.25) /
         |     (CAST(tf.tf AS DOUBLE) + 1.25 * (0.25 + 0.75 * (CAST(lens.len AS DOUBLE) / st.avgdl))))
         |    * 1048576.0) / 1048576.0) AS s
         |  FROM tf JOIN v USING (token) JOIN lens ON tf.doc = lens.doc CROSS JOIN st)
         |SELECT doc, SUM(s) AS bm25_micro FROM sc GROUP BY doc""").stripMargin) { (s, dir) =>
      import graft.ext.{Bm25, TfIdf}
      val terms = Seq("spark", "merge", "window", "scan")
      val docs = Tables.load(s, dir, "documents")
      val tok = TfIdf.tokenized(docs, "doc_id", "text")
      val lens = Bm25.docLengths(docs, "doc_id", "text")
      val stage = QueryDef.stageDir(dir)
      Bm25.idf(tok, docs.count(), terms)
        .write.mode("overwrite").parquet(s"$stage/bm25_idf")
      Bm25.stats(lens).coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/bm25_stats")
      Bm25.score(tok, lens, s.read.parquet(s"$stage/bm25_idf"),
        s.read.parquet(s"$stage/bm25_stats"))
    },

    // BM25 serving over the LAKEHOUSE — the retrieval analog of
    // ext_ann_lakehouse: the inverted index (one posting row per
    // (token, doc) with tf and the doc length denormalized in) lives IN
    // a txlog table bucket-partitioned by pmod(hash(token), 16), so a
    // query's terms derive their exact buckets DRIVER-SIDE and the scan
    // opens only those partitions — per-query read cost follows
    // |terms|/16 of the index, not the corpus, and the index gets
    // ACID/time-travel for free. Corpus stats ride a one-row staged
    // table; the query-term IDF is computed FROM the index's own df and
    // staged micro-nat; scoring is ext_text_bm25's exact dyadic tree.
    // The oracle recomputes the full result from raw documents — proving
    // the index path equals a corpus scan — while the requires pin that
    // the scan actually pruned.
    QueryDef("ext_bm25_lakehouse",
      "BM25 serving from a bucket-pruned txlog posting-list table: term probes prune partitions before postings are read; scores oracled vs a corpus recompute",
      ("""WITH tok AS (SELECT doc_id AS doc, u.t AS token
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents),
         |  UNNEST(tk) AS u(t)),
         |lens AS (SELECT doc_id AS doc,
         |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS len FROM documents),
         |""" +
       s"""v AS (SELECT token, idf_micro FROM read_parquet('${QueryDef.StageSql}/bm25lh_idf/*.parquet')),
         |st AS (SELECT CAST(total_toks AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
         |  FROM read_parquet('${QueryDef.StageSql}/bm25lh_stats/*.parquet')),
         |""" +
       """tf AS (SELECT doc, token, COUNT(*) AS tf FROM tok JOIN v USING (token) GROUP BY 1, 2),
         |sc AS (SELECT tf.doc, v.idf_micro * (floor(
         |    ((CAST(tf.tf AS DOUBLE) * 2.25) /
         |     (CAST(tf.tf AS DOUBLE) + 1.25 * (0.25 + 0.75 * (CAST(lens.len AS DOUBLE) / st.avgdl))))
         |    * 1048576.0) / 1048576.0) AS s
         |  FROM tf JOIN v USING (token) JOIN lens ON tf.doc = lens.doc CROSS JOIN st)
         |SELECT doc, SUM(s) AS bm25_micro FROM sc GROUP BY doc""").stripMargin) { (s, dir) =>
      import graft.ext.{Bm25, TfIdf}
      import graft.ops.TxLog
      val terms = Seq("hash", "sort", "batch", "line")
      val docs = Tables.load(s, dir, "documents")
      val stage = QueryDef.stageDir(dir)
      // the index is append-only and input-deterministic — build once
      // per sf; a production pipeline refreshes it incrementally like
      // ext_tfidf_incremental's df tables
      val table = Fixtures.immutableTable(dir, "bm25lh", 1) { t =>
        TxLog.setProperties(t, Map(
          "graft.generated.bkt" -> "pmod(hash(token), 16)",
          "graft.partition.columns" -> "bkt"))
        TxLog.append(
          TfIdf.termFreq(TfIdf.tokenized(docs, "doc_id", "text"))
            .join(Bm25.docLengths(docs, "doc_id", "text"), Seq("doc")), t)
      }
      val statsPath = Fixtures.stagedInput(dir, "bm25lh_stats", 1)(
        Bm25.stats(Bm25.docLengths(docs, "doc_id", "text")).coalesce(1))
      val statsDf = s.read.parquet(statsPath)
      val probes = TxLog.deriveGeneratedEqProbes(table, None,
        Map("token" -> terms))
      require(probes.contains("bkt"),
        "term probes must derive their bucket partitions")
      val pruned = TxLog.readPruned(s, table, Map.empty, Map.empty,
        eqProbes = probes)
      require(pruned.inputFiles.length < TxLog.activeFiles(table).size,
        "non-probed token buckets must be pruned")
      val matched = pruned.filter(col("token").isInCollection(terms))
      // query-term IDF from the index's own document frequencies
      matched.groupBy("token").agg(count(lit(1)).alias("df"))
        .crossJoin(broadcast(statsDf))
        .select(col("token"),
          round(log(lit(1d) + (col("n_docs").cast("double") - col("df") +
            lit(0.5)) / (col("df") + lit(0.5))) * 1e6).cast("long")
            .alias("idf_micro"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/bm25lh_idf")
      val avgdl = col("total_toks").cast("double") /
        col("n_docs").cast("double")
      matched
        .join(broadcast(s.read.parquet(s"$stage/bm25lh_idf")), Seq("token"))
        .crossJoin(broadcast(statsDf))
        .select(col("doc"), (col("idf_micro") *
          Bm25.saturation(col("tf"), col("len"), avgdl)).alias("s"))
        .groupBy("doc").agg(sum(col("s")).alias("bm25_micro"))
    },

    // Entity-resolution fuzzy join — the record-linkage step that maps
    // dirty surface forms onto canonical entities (products, authors,
    // domains) before joins and dedup can key on them. Scale shape:
    // match the DISTINCT name dictionary, not raw rows (names are
    // vocabulary-sized; 100 TB of rows equi-join back to the matched
    // dictionary afterwards), block candidates on the first token (the
    // classic blocking key — bounded blocks, never all-pairs across
    // blocks), and verify survivors with exact Levenshtein — an integer
    // both engines define identically, so the oracle replays blocking
    // AND verification bit-for-bit. Like the LSH dedup entries, blocking
    // recall is a documented trade (a first-token typo escapes the
    // block); the verify stage is exact on what blocking admits.
    QueryDef("ext_fuzzy_join",
      "entity-resolution fuzzy self-join: distinct-name dictionary, first-token blocking, exact levenshtein ≤ 3 verify",
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        | AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin) { (s, dir) =>
      val names = Tables.load(s, dir, "part").select("p_name").distinct()
      val a = names.select(col("p_name").alias("name_a"),
        split(col("p_name"), " ").getItem(0).alias("blk"))
      val b = names.select(col("p_name").alias("name_b"),
        split(col("p_name"), " ").getItem(0).alias("blk"))
      a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    },

    QueryDef("ext_quality_threshold",
      "quality gate: keep docs at/above the exact 75th-percentile quality score (the C4/Gopher-style filter step)",
      """WITH q AS (SELECT doc_id,
        |  (CASE WHEN n_toks < 5 THEN n_toks / 5.0 WHEN n_toks > 10000 THEN 0.5 ELSE 1.0 END)
        |  * (CASE WHEN punct > 0.3 THEN 0.3 ELSE 1.0 END) AS quality
        |FROM (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS DOUBLE) AS n_toks,
        |  CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) AS punct
        |FROM documents)),
        |t AS (SELECT quantile_cont(quality, 0.75) AS thr FROM q)
        |SELECT doc_id, quality FROM q, t WHERE quality >= thr""".stripMargin) { (s, dir) =>
      val q = Tables.load(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).alias("quality"))
      val thr = q.agg(expr("percentile(quality, 0.75)").alias("thr"))
      q.crossJoin(broadcast(thr)).filter(col("quality") >= col("thr"))
        .select("doc_id", "quality")
    },

    QueryDef("ext_sample_stratified",
      "deterministic stratified sample: per-lang keep rates via md5-prefix intervals (sampleBy without rand())", {
      import graft.ext.PipelineOps.rateHex
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h FROM documents)
         |WHERE h < CASE WHEN lang = 'en' THEN '${rateHex(0.5)}'
         |              WHEN lang = 'fr' THEN '${rateHex(0.25)}'
         |              ELSE '${rateHex(0.1)}' END""".stripMargin
    }) { (s, dir) =>
      PipelineOps.stratifiedSample(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang", Map("en" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)
    },

    QueryDef("ext_zorder_key",
      "Morton z-order key over two bucketed dimensions (the layout key behind Maintenance.rewriteZOrdered)", {
      val z = graft.functions.ZOrder.interleaveSql(
        "(o_custkey & 255)", "(o_orderkey & 255)", bits = 8)
      s"SELECT o_orderkey, $z AS z FROM orders"
    }) { (s, dir) =>
      Tables.load(s, dir, "orders").select(col("o_orderkey"),
        graft.functions.ZOrder.interleave2(
          col("o_custkey").bitwiseAND(lit(255)),
          col("o_orderkey").bitwiseAND(lit(255)), bits = 8).alias("z"))
    },

    // Same grid as ext_zorder_key so the two layout keys are comparable;
    // the oracle recomputes the per-bit rotate/flip walk as nested
    // subqueries (HilbertKey.xy2dSql) — a bit-for-bit cross-engine check
    // of the curve, not just a row count.
    QueryDef("ext_hilbert_key",
      "Hilbert curve key over two bucketed dimensions (higher-locality alternative to the Morton key; see Maintenance.rewriteCurveOrdered)", {
      val walk = graft.functions.HilbertKey.xy2dSql(
        "o_custkey & 255", "o_orderkey & 255", bits = 8,
        from = "orders", passCols = Seq("o_orderkey"))
      s"SELECT o_orderkey, _hd AS h FROM ($walk)"
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables.load(s, dir, "orders").select(col("o_orderkey"),
        call_function("hilbert_key",
          col("o_custkey").bitwiseAND(lit(255)).cast("long"),
          col("o_orderkey").bitwiseAND(lit(255)).cast("long"),
          lit(8)).alias("h"))
    },

    QueryDef("ext_contamination",
      "benchmark decontamination: fraction of distinct 3-gram shingles shared with the benchmark subset (doc_id < 20)",
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END AS shl FROM tok),
        |b AS (SELECT DISTINCT u.s FROM sh, UNNEST(list_distinct(shl)) AS u(s) WHERE doc_id < 20),
        |c AS (SELECT doc_id, u.s FROM sh, UNNEST(list_distinct(shl)) AS u(s) WHERE doc_id >= 20),
        |shr AS (SELECT c.doc_id, COUNT(*) AS n_shared FROM c JOIN b ON c.s = b.s GROUP BY c.doc_id),
        |tot AS (SELECT doc_id, len(list_distinct(shl)) AS n_total FROM sh WHERE doc_id >= 20)
        |SELECT t.doc_id, s.n_shared, t.n_total,
        |  CAST(s.n_shared AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS contamination
        |FROM shr s JOIN tot t ON s.doc_id = t.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.contamination(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), "doc_id", "text", n = 3)
    },

    // Temperature mixing: the rate DERIVATION (α-weighted budget shares)
    // is driver-side float math that no cross-engine hash could pin, so
    // the computed per-source hex thresholds are STAGED and both engines
    // apply the identical deterministic md5-interval filter; the
    // derivation itself is pinned in TemperatureMixSpec (α=1 ⇒ every rate
    // equals budgetFrac exactly; α=0 ⇒ even budget split; caps at 1).
    QueryDef("ext_mix_temperature",
      "temperature-weighted corpus mixing: α=0.5 budget shares per source, deterministic md5-interval application (filter oracled over staged thresholds)",
      s"""WITH thr AS (SELECT source, thr FROM read_parquet('${QueryDef.StageSql}/mix_rates/*.parquet'))
         |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
         |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val rates = PipelineOps.temperatureRates(docs, "source", "n_chars",
        alpha = 0.5, budgetFrac = 0.4)
      val thrDf = s.createDataFrame(rates.toSeq.map { case (src, r) =>
        (src, PipelineOps.rateHex(r)) }).toDF("source", "thr")
      val stage = QueryDef.stageDir(dir)
      thrDf.coalesce(1).write.mode("overwrite").parquet(s"$stage/mix_rates")
      docs.join(broadcast(s.read.parquet(s"$stage/mix_rates")), Seq("source"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
        .select("doc_id", "source")
    },

    // The 100 TB shape of ext_contamination: shingles carried as xxhash64
    // (8 bytes) instead of strings. Spark's xxhash64 has no DuckDB
    // equivalent, so both hash sets are staged and the oracle recomputes
    // the broadcast semi-join + per-doc counts over the identical staged
    // inputs (the string entry above keeps full shingling oracled).
    QueryDef("ext_contamination_hashed",
      "benchmark decontamination over 8-byte shingle hashes (corpus-scale variant; join+counts oracled over staged hash sets)",
      s"""WITH c AS (SELECT doc_id, h FROM read_parquet('${QueryDef.StageSql}/contam_corpus/*.parquet')),
         |b AS (SELECT DISTINCT h FROM read_parquet('${QueryDef.StageSql}/contam_bench/*.parquet')),
         |shr AS (SELECT doc_id, COUNT(*) AS n_shared FROM c JOIN b USING (h) GROUP BY doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_total FROM c GROUP BY doc_id)
         |SELECT t.doc_id, s.n_shared, t.n_total,
         |  CAST(s.n_shared AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS contamination
         |FROM shr s JOIN tot t ON s.doc_id = t.doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.load(s, dir, "documents")
      val ch = PipelineOps.shingleHashSet(
        docs.filter(col("doc_id") >= 20), "doc_id", "text", n = 3)
      val bh = PipelineOps.shingleHashSet(
        docs.filter(col("doc_id") < 20), "doc_id", "text", n = 3).select("h")
      val stage = QueryDef.stageDir(dir)
      ch.write.mode("overwrite").parquet(s"$stage/contam_corpus")
      bh.write.mode("overwrite").parquet(s"$stage/contam_bench")
      PipelineOps.contaminationFromHashes(
        s.read.parquet(s"$stage/contam_corpus"),
        s.read.parquet(s"$stage/contam_bench"), "doc_id")
    },

    QueryDef("ext_dedup_ngram_span",
      "cross-document duplicated 5-token spans: per-doc count + ratio of spans shared with any other doc (boilerplate detector)",
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
        |       ELSE list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' ')) END AS shl FROM tok),
        |sp AS (SELECT doc_id, u.s FROM sh, UNNEST(list_distinct(shl)) AS u(s)),
        |d AS (SELECT s FROM sp GROUP BY s HAVING COUNT(*) > 1),
        |pd AS (SELECT sp.doc_id, COUNT(*) AS n_dup FROM sp JOIN d ON sp.s = d.s GROUP BY sp.doc_id),
        |tot AS (SELECT doc_id, len(list_distinct(shl)) AS n_spans FROM sh)
        |SELECT t.doc_id, p.n_dup, t.n_spans,
        |  CAST(p.n_dup AS DOUBLE) / CAST(t.n_spans AS DOUBLE) AS dup_ratio
        |FROM pd p JOIN tot t ON p.doc_id = t.doc_id""".stripMargin) { (s, dir) =>
      PipelineOps.duplicatedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 5)
    },

    // Incremental IDF refresh: the base corpus contributes only its
    // persisted (token, df) table — its text is never rescanned. The
    // oracle reads the SAME staged base table but recomputes the batch
    // side from raw text, so the check covers both the merge arithmetic
    // and the batch tokenization.
    QueryDef("ext_tfidf_incremental",
      "incremental IDF refresh: persisted base df-table + fresh batch → merged df + micro-nat IDF without rescanning the base corpus",
      ("""WITH tok AS (SELECT doc_id, u.t AS token
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents WHERE doc_id >= 300),
         |  UNNEST(tk) AS u(t)),
         |bdf AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
         |""" +
       s"""base AS (SELECT token, df FROM read_parquet('${QueryDef.StageSql}/inc_idf_base/*.parquet')),
         |nd AS (SELECT n_docs FROM read_parquet('${QueryDef.StageSql}/inc_idf_ndocs/*.parquet')),
         |""" +
       """m AS (SELECT token, CAST(SUM(df) AS BIGINT) AS df
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM bdf) GROUP BY token)
         |SELECT token, df,
         |  CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1e6) AS BIGINT) AS idf_micro
         |FROM m CROSS JOIN nd""").stripMargin) { (s, dir) =>
      import graft.ext.TfIdf
      val docs = Tables.load(s, dir, "documents")
      val base = docs.filter(col("doc_id") < 300)
      val batch = docs.filter(col("doc_id") >= 300)
      val stage = QueryDef.stageDir(dir)
      TfIdf.docFreq(TfIdf.tokenized(base, "doc_id", "text"))
        .write.mode("overwrite").parquet(s"$stage/inc_idf_base")
      val nDocs = base.count() + batch.count()
      s.createDataFrame(Seq(Tuple1(nDocs))).toDF("n_docs").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/inc_idf_ndocs")
      TfIdf.mergeIdf(Seq(
        s.read.parquet(s"$stage/inc_idf_base"),
        TfIdf.docFreq(TfIdf.tokenized(batch, "doc_id", "text"))), nDocs)
    },

    // Keyed MERGE ("upsert") on a plain parquet lake — the Delta-style
    // write path (reference M:127-132) without Delta jars: latest version
    // per key wins, incoming batch beats existing on ties, committed via
    // the SafeSwap two-rename protocol. Both input frames are staged so
    // the oracle replays the identical merge window.
    QueryDef("ext_upsert_merge",
      "MERGE into a txlog parquet table: per-key latest-version-wins upsert (updates + brand-new keys), atomic versioned commit",
      s"""WITH b AS (SELECT *, 0 AS _src FROM read_parquet('${QueryDef.StageSql}/upsert_base/*.parquet')),
         |u AS (SELECT *, 1 AS _src FROM read_parquet('${QueryDef.StageSql}/upsert_updates/*.parquet')),
         |r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY version DESC, _src DESC) AS rn
         |      FROM (SELECT * FROM b UNION ALL SELECT * FROM u))
         |SELECT c_custkey, c_name, c_acctbal, version FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val base = cust.withColumn("version", lit(1L))
      val updates = cust.filter(pmod(col("c_custkey"), lit(5)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .withColumn("version", lit(2L))
        .unionByName(cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
          .withColumn("version", lit(1L)))
      val stage = QueryDef.stageDir(dir)
      base.write.mode("overwrite").parquet(s"$stage/upsert_base")
      updates.write.mode("overwrite").parquet(s"$stage/upsert_updates")
      val target = java.nio.file.Files
        .createTempDirectory("graft_upsert").toString + "/t"
      // txlog-committed since r7 (VERDICT r6 item 1): v1 = base load,
      // v2 = merge — same merge semantics as Upsert.mergeIntoParquet, but
      // published through an atomic versioned commit instead of SafeSwap's
      // directory swap (which st12 still exercises)
      TxLog.overwrite(s.read.parquet(s"$stage/upsert_base"), target)
      TxLog.merge(s, target,
        s.read.parquet(s"$stage/upsert_updates"), Seq("c_custkey"), "version")
      TxLog.read(s, target)
    }
  )
}
