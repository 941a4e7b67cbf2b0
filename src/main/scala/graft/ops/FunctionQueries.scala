package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Graft, Tables}

/** Scalar-function surface (SURVEY.md §2.8 F1–F17), mapped onto the harness
  * tables. Reference semantics (ANSI off → NULL on bad cast / x÷0,
  * LEGACY time parser) are enabled per-query via
  * [[graft.Graft.referenceSemantics]], mirroring details.py:111 and the
  * pre-ANSI Spark the reference ran on.
  *
  * DuckDB oracle notes: DuckDB `regexp_replace` needs the `'g'` flag to match
  * Spark's replace-all; DuckDB list indexing is 1-based where Spark's
  * `getItem` is 0-based; DuckDB `TRY_CAST` ≡ ANSI-off Spark cast.
  */
object FunctionQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("f1_regexp_replace_class",
      "regexp_replace char-class strip (ref D:68, D:81 strips [ ] ')",
      """SELECT event_id, regexp_replace(props, '[{}"]', '', 'g') AS props_clean FROM events""") { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), """[{}"]""", "").alias("props_clean"))
    },

    QueryDef("f2_regexp_replace_backslash",
      "regexp_replace literal-backslash strip (ref D:189/192/195)",
      "SELECT doc_id, regexp_replace(text, '\\\\', '', 'g') AS text_clean FROM documents") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), "\\\\", "").alias("text_clean"))
    },

    QueryDef("f3_regexp_replace_quote",
      "regexp_replace double-quote strip (ref D:189/192/195)",
      """SELECT event_id, regexp_replace(props, '"', '', 'g') AS props_nq FROM events""") { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "\"", "").alias("props_nq"))
    },

    // Split semantics proven through a sortable projection (n_words + the
    // '|'-rejoined array): the verifier's pandas sort cannot hash raw array
    // columns. The array-returning form is the library's split itself.
    QueryDef("f4_split_to_array",
      "split string → array (ref D:76, D:86), array projected sortable",
      "SELECT doc_id, len(string_split(text, ' ')) AS n_words, array_to_string(string_split(text, ' '), '|') AS words_joined FROM documents") { (s, dir) =>
      val words = split(col("text"), " ")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(words).alias("n_words"),
          array_join(words, "|").alias("words_joined"))
    },

    // explode_outer: the row-preserving explode variant (F16 covers the
    // inner cross-product form). DuckDB has no outer unnest — the oracle
    // substitutes [NULL] for empty lists, which is exactly its semantics.
    QueryDef("f20_explode_outer",
      "explode_outer keeps a NULL row for docs with no matches (emails per doc)",
      s"""SELECT doc_id, u.email FROM (
         |  SELECT doc_id, regexp_extract_all(text, '${graft.ext.TextAnalysis.EMAIL_PATTERN}') AS l
         |  FROM documents) t,
         |UNNEST(CASE WHEN l IS NULL OR len(l) = 0 THEN [NULL] ELSE l END) AS u(email)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"),
          lit(graft.ext.TextAnalysis.EMAIL_PATTERN), lit(0))).alias("email"))
    },

    // Array function family over tokenized text: sort/distinct/contains/
    // slice — all codegen'd builtins, no UDFs. Arrays are projected
    // through array_join/size (verifier can't sort raw arrays); DuckDB
    // list slicing is 1-based inclusive where Spark's slice(arr, 1, 3)
    // takes 3 from position 1 — same elements.
    QueryDef("f21_array_funcs",
      "array functions: sort_array, array_distinct, array_contains, slice, size",
      """SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
        |  list_contains(tk, 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(tk))[1:3], ' ') AS first3
        |FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.ext.TextAnalysis.tokens(lower(col("text"))).alias("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").alias("n_tokens"),
          size(array_distinct(col("tk"))).cast("long").alias("n_distinct"),
          array_contains(col("tk"), "spark").alias("has_spark"),
          array_join(slice(sort_array(array_distinct(col("tk"))), 1, 3), " ")
            .alias("first3"))
    },

    // Higher-order functions (transform/filter/aggregate/exists): the
    // lambda-expression surface that keeps per-element logic inside
    // codegen instead of a UDF. Integer accumulators only — exact on both
    // engines regardless of fold order.
    QueryDef("f22_higher_order",
      "higher-order array lambdas: transform+aggregate (char sum), filter (len>4 count), exists (len>8)",
      """SELECT doc_id,
        |  CAST(COALESCE(list_sum(list_transform(tk, x -> len(x))), 0) AS BIGINT) AS total_chars,
        |  CAST(len(list_filter(tk, x -> len(x) > 4)) AS BIGINT) AS n_long,
        |  len(list_filter(tk, x -> len(x) > 8)) > 0 AS any_very_long
        |FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk FROM documents)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.ext.TextAnalysis.tokens(lower(col("text"))).alias("tk"))
        .selectExpr("doc_id",
          "CAST(aggregate(tk, 0, (a, x) -> a + length(x)) AS BIGINT) AS total_chars",
          "CAST(size(filter(tk, x -> length(x) > 4)) AS BIGINT) AS n_long",
          "exists(tk, x -> length(x) > 8) AS any_very_long")
    },

    QueryDef("f5_split_index",
      "split + element index (ref R:42-43 helpfulness x/y)",
      "SELECT event_id, string_split(props, ':')[2] AS after_colon FROM events") { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          split(col("props"), ":").getItem(1).alias("after_colon"))
    },

    QueryDef("f6_cast_float_null_on_garbage",
      "cast to float, NULL on unparseable (ref D:99, R:47-48; ANSI off)",
      "SELECT doc_id, TRY_CAST(lang AS FLOAT) AS lang_f, CAST(n_chars AS FLOAT) AS chars_f FROM documents") { (s, dir) =>
      Graft.referenceSemantics(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          col("lang").cast(FloatType).alias("lang_f"),
          col("n_chars").cast(FloatType).alias("chars_f"))
    },

    QueryDef("f7_cast_long",
      "cast numeric string to long (ref R:76)",
      "SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events") { (s, dir) =>
      Graft.referenceSemantics(s)
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).cast(LongType).alias("k"))
    },

    QueryDef("f8_division_null_on_zero",
      "x / y with y=0 → NULL (ref R:52; ANSI-off division semantics)",
      "SELECT event_id, value / NULLIF(CAST(regexp_extract(props, '[0-9]+') AS BIGINT), 0) AS ratio FROM events") { (s, dir) =>
      Graft.referenceSemantics(s)
      val k = regexp_extract(col("props"), "[0-9]+", 0).cast(LongType)
      Tables.load(s, dir, "events")
        .select(col("event_id"), (col("value") / k).alias("ratio"))
    },

    // Divisor 7 ⇒ non-terminating decimal ⇒ never lands on a .xx5 rounding
    // tie, so Spark's shortest-repr rounding and DuckDB's binary rounding
    // agree (see p1_withcolumn note).
    QueryDef("f9_round",
      "round(expr, 2) (ref R:52)",
      "SELECT l_orderkey, l_linenumber, ROUND(l_quantity / 7.0, 2) AS q7 FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity") / 7.0, 2).alias("q7"))
    },

    QueryDef("f10_to_date_year_legacy",
      "to_date(col,'yyyy') under LEGACY parser (ref D:109-113)",
      "SELECT o_orderkey, CAST(strptime(CAST(year(o_orderdate) AS VARCHAR), '%Y') AS DATE) AS pub_date FROM orders") { (s, dir) =>
      Graft.referenceSemantics(s)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(year(col("o_orderdate")).cast(StringType), "yyyy").alias("pub_date"))
    },

    QueryDef("f11_to_date_no_format",
      "to_date without format (ref M:117)",
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders") { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate").cast(StringType)).alias("order_date"))
    },

    QueryDef("f12_year_extract",
      "year(date) extraction + group (ref D:113, M:117, M:121)",
      "SELECT year(l_shipdate) AS ship_year, COUNT(*) AS n FROM lineitem GROUP BY 1") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).alias("ship_year"))
        .agg(count(lit(1)).alias("n"))
    },

    QueryDef("f13_from_unixtime",
      "unix seconds → formatted string in session TZ=UTC (ref R:76)",
      "SELECT doc_id, strftime(to_timestamp(n_chars * 100000), '%Y-%m-%d %H:%M:%S') AS fake_ts FROM documents") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          from_unixtime(col("n_chars") * 100000).alias("fake_ts"))
    },

    QueryDef("f14_startswith",
      "startsWith predicate as boolean column (ref D:128/135/142)",
      "SELECT doc_id, (source LIKE 'src1%') AS is_src1 FROM documents") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source").startsWith("src1").alias("is_src1"))
    },

    QueryDef("f15_isnull",
      "isNull predicate as boolean column (ref D:128, R:86)",
      "SELECT event_id, (value IS NULL) AS value_missing FROM events") { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("value").isNull.alias("value_missing"))
    },

    QueryDef("f16_double_explode_cross",
      "two explodes ⇒ per-row cross product (ref D:151-153 authors×categories)",
      "SELECT doc_id, u.w, v.t FROM documents, UNNEST(string_split(text, ' ')[1:3]) AS u(w), UNNEST([lang, source]) AS v(t)") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(slice(split(col("text"), " "), 1, 3)).alias("w"),
          array(col("lang"), col("source")).alias("b"))
        .select(col("doc_id"), col("w"), explode(col("b")).alias("t"))
    },

    QueryDef("f17_rename",
      "column rename via withColumnRenamed (ref R:113)",
      "SELECT c_custkey, c_name AS customer_name FROM customer") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_name", "customer_name")
    }
  )
}
