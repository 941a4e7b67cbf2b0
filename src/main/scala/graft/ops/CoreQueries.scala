package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational core of the operator inventory (SURVEY.md §2.1–2.7):
  * scans/sinks (S1–S3), projections & filters (P1–P10), joins (J1 + the
  * join types Spark gives for free), aggregations (A1–A7), limits (L1),
  * set operations.
  *
  * Every query reads via [[graft.Tables.load]] so pushdown/pruning reach the
  * parquet scan, and emits a deterministic row-set with oracle-matched
  * column names.
  */
object CoreQueries {

  private def decSum(c: org.apache.spark.sql.Column, p: Int, s: Int) =
    sum(c.cast(DecimalType(p, s))).cast(DoubleType)

  val defs: Seq[QueryDef] = Seq(

    // ---- S: scans / sources / sinks --------------------------------------
    QueryDef("s1_csv_scan",
      "CSV batch scan, header + inferSchema (ref D:54, R:29); round-trips region through a temp CSV dir",
      "SELECT r_regionkey, r_name FROM region") { (s, dir) =>
      val tmp = Files.createTempDirectory("graft_s1_csv").toString
      Tables.load(s, dir, "region")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.format("csv")
        .option("header", "true").option("inferSchema", "true").load(tmp)
    },

    QueryDef("s2_parquet_sink_scan",
      "Parquet batch sink + scan back (ref D:203/207, R:119/125)",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_returnflag = 'R'") { (s, dir) =>
      val tmp = Files.createTempDirectory("graft_s2_parquet").toString
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
    },

    QueryDef("s3_parquet_scan",
      "Parquet batch scan with projection pruning (ref D:207)",
      "SELECT r_regionkey, r_name FROM region") { (s, dir) =>
      Tables.load(s, dir, "region").select("r_regionkey", "r_name")
    },

    // ---- P: projections / filters / null handling ------------------------
    // NB: not ROUND(x, 2) — Spark rounds the double's shortest decimal repr
    // (BigDecimal.valueOf) while DuckDB rounds the exact binary value, so
    // near-tie rows differ by 1 ulp of a cent. A DECIMAL(22,6) cast is exact
    // for products of three 2-decimal inputs → bit-identical in both engines.
    QueryDef("p1_withcolumn",
      "withColumn derived expression (ref D:68..R:76)",
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6)) AS DOUBLE) AS net_price FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("net_price",
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast(DecimalType(22, 6)).cast(DoubleType))
        .select("l_orderkey", "l_linenumber", "net_price")
    },

    QueryDef("p2_select_alias",
      "select projection with aliases (ref D:153, R:113)",
      "SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment FROM customer") { (s, dir) =>
      Tables.load(s, dir, "customer").select(
        col("c_custkey").alias("cust_id"),
        col("c_name").alias("name"),
        col("c_mktsegment").alias("segment"))
    },

    QueryDef("p3_drop_column",
      "drop columns (ref R:93 drops null-heavy Price)",
      "SELECT p_partkey, p_name, p_brand, p_type FROM part") { (s, dir) =>
      Tables.load(s, dir, "part").drop("p_retailprice", "p_size")
    },

    QueryDef("p4_filter_startswith_or_null",
      "filter startsWith(...) OR isNull (ref D:128/135/142 URL sanity)",
      "SELECT doc_id, source, lang FROM documents WHERE source LIKE 'src1%' OR lang IS NULL") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(col("source").startsWith("src1") || col("lang").isNull)
        .select("doc_id", "source", "lang")
    },

    QueryDef("p5_where_isnull_count",
      "where isNull + count action (ref R:86)",
      "SELECT COUNT(*) AS null_cnt FROM events WHERE value IS NULL") { (s, dir) =>
      Tables.load(s, dir, "events")
        .where(col("value").isNull)
        .agg(count(lit(1)).alias("null_cnt"))
    },

    QueryDef("p6_filter_year_derived",
      "WHERE on derived YEAR(...) (ref M:121)",
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice FROM orders WHERE year(o_orderdate) > 1998") { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) > 1998)
        .select(col("o_orderkey"),
          col("o_orderdate").cast(DateType).alias("order_date"),
          col("o_totalprice"))
    },

    QueryDef("p7_dropna_all",
      "na.drop over all columns (ref D:176)",
      "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL") { (s, dir) =>
      Tables.load(s, dir, "documents").na.drop()
    },

    QueryDef("p8_dropna_subset",
      "na.drop on a column subset (ref R:69)",
      "SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL") { (s, dir) =>
      Tables.load(s, dir, "events")
        .na.drop(Seq("value", "user_id"))
        .select("event_id", "event_type", "value")
    },

    QueryDef("p9_fillna_map",
      "na.fill with per-column map (ref D:167-169, R:104-107)",
      "SELECT c_custkey, COALESCE(c_acctbal, 0.0) AS c_acctbal, COALESCE(c_mktsegment, 'N.A') AS c_mktsegment FROM customer") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .na.fill(Map("c_acctbal" -> 0.0, "c_mktsegment" -> "N.A"))
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    },

    QueryDef("p10_sql_over_view",
      "temp view + SQL SELECT (ref M:22-25, C1/C2)",
      "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2") { (s, dir) =>
      Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql("SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2")
    },

    // ---- J: joins --------------------------------------------------------
    QueryDef("j1_join_inner_equi",
      "inner equi-join, batch analog of the bronze-bronze Title join (ref M:116-121)",
      "SELECT o_orderkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey") { (s, dir) =>
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    },

    QueryDef("j2_join_left_outer",
      "left outer join (API surface beyond the reference's single inner join)",
      "SELECT n_nationkey, n_name, r_name FROM nation LEFT JOIN region ON n_regionkey = r_regionkey") { (s, dir) =>
      Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select("n_nationkey", "n_name", "r_name")
    },

    QueryDef("j3_join_left_semi",
      "left semi join: customers that have orders",
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    QueryDef("j4_join_left_anti",
      "left anti join: customers without orders",
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    QueryDef("j5_join_multiway_agg",
      "4-way star join + grouped revenue (TPC-H Q5 shape; broadcast dims)",
      """SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType))
        .groupBy("n_name")
        .agg(
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 20, 4).alias("revenue"),
          count(lit(1)).alias("n_lines"))
    },

    QueryDef("j6_join_range_predicate",
      "equi-join with extra range predicate (non-equi condition)",
      "SELECT o_orderstatus, COUNT(*) AS late_lines FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY GROUP BY o_orderstatus") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).alias("late_lines"))
    },

    QueryDef("j7_join_full_outer",
      "full outer join of two sparse per-nation aggregates (COALESCE'd keys; the reconciliation-join shape)",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_rich FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_poor FROM supplier WHERE s_acctbal < -800 GROUP BY s_nationkey)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_rich, s.n_poor
        |FROM c FULL JOIN s ON c.nk = s.nk""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").alias("c_nk"))
        .agg(count(lit(1)).alias("n_rich"))
      val su = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < -800)
        .groupBy(col("s_nationkey").alias("s_nk"))
        .agg(count(lit(1)).alias("n_poor"))
      c.join(su, col("c_nk") === col("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).alias("nationkey"),
          col("n_rich"), col("n_poor"))
    },

    // Null-safe equality (<=> / IS NOT DISTINCT FROM): the join form every
    // dimension-conforming pipeline needs when the key column is nullable —
    // a plain equi-join silently drops NULL-keyed rows. NULLIF derives a
    // genuinely NULL key from the data so both engines exercise the
    // NULL<=>NULL match.
    QueryDef("j8_join_null_safe",
      "null-safe equi-join (<=>): NULL keys match NULL dimension rows instead of being dropped",
      """WITH d AS (SELECT doc_id, NULLIF(lang, 'en') AS lk FROM documents),
        |dim AS (SELECT DISTINCT NULLIF(lang, 'en') AS lk,
        |        COALESCE(NULLIF(lang, 'en'), 'DEFAULT') AS label FROM documents)
        |SELECT d.doc_id, dim.label FROM d JOIN dim ON d.lk IS NOT DISTINCT FROM dim.lk""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val d = docs.select(col("doc_id"), nullif(col("lang"), lit("en")).alias("lk"))
      val dim = docs.select(nullif(col("lang"), lit("en")).alias("dlk"),
          coalesce(nullif(col("lang"), lit("en")), lit("DEFAULT")).alias("label"))
        .distinct()
      d.join(dim, col("lk") <=> col("dlk")).select("doc_id", "label")
    },

    // Skew-hardened join: the reference's J1 joins on book Title
    // (M:116-121) — at 100× scale the hot titles are classic skew keys. A
    // synthetic 30%-hot key (3 of every 10 orderkeys collapse to key 0)
    // joins a distinct-key dim through Skew.saltedJoin, which spreads the
    // hot key across 16 salt sub-keys so no shuffle partition holds 30% of
    // the table. AQE's runtime skew split covers the batch path; explicit
    // salting is the fix for streaming joins (AQE off) and single-key
    // pathologies. Both halves — AQE splitting this key distribution and
    // the salted join's partition balance (max ≤ 2× median) — are asserted
    // in AqeSkewSpec.
    QueryDef("j9_join_skew",
      "skew-hardened join: 30%-hot key salted across 16 sub-keys (Skew.saltedJoin), grouped rollup — same rows as the plain join, even partitions",
      """WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey % 997 END AS sk, l_quantity FROM lineitem),
        |d AS (SELECT DISTINCT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey % 997 END AS dk FROM lineitem),
        |dim AS (SELECT dk, 'g' || CAST(dk % 7 AS VARCHAR) AS grp FROM d)
        |SELECT grp, COUNT(*) AS n_rows, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM f JOIN dim ON f.sk = dim.dk GROUP BY grp""".stripMargin) { (s, dir) =>
      def skewKey(c: org.apache.spark.sql.Column) =
        when(pmod(c, lit(10)) < 3, lit(0L)).otherwise(pmod(c, lit(997)))
      val f = Tables.load(s, dir, "lineitem")
        .select(skewKey(col("l_orderkey")).alias("sk"), col("l_quantity"))
      val dim = Tables.load(s, dir, "lineitem")
        .select(skewKey(col("l_orderkey")).alias("dk")).distinct()
        .withColumn("grp",
          concat(lit("g"), pmod(col("dk"), lit(7)).cast("string")))
      graft.ops.Skew.saltedJoin(f, dim, "sk", "dk", saltFactor = 16)
        .groupBy("grp")
        .agg(count(lit(1)).alias("n_rows"),
          sum(col("l_quantity").cast("long")).alias("sum_qty"))
    },

    // ---- SQL subquery surface -------------------------------------------
    QueryDef("sql2_exists_subquery",
      "correlated EXISTS / NOT EXISTS / IN subqueries (Catalyst rewrites to semi/anti joins — verified in PlanSpec)",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
              |  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
              |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)""".stripMargin)
    },

    // Scalar subqueries: uncorrelated (one broadcast value) and correlated
    // (rewritten to an outer-join aggregate). MAX/COUNT only — exact
    // selections, no order-dependent float accumulation.
    QueryDef("sql3_scalar_subquery",
      "scalar subqueries: uncorrelated MAX threshold + correlated per-row COUNT",
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        |FROM orders o
        |WHERE o_totalprice >= (SELECT MAX(o_totalprice) FROM orders) * 0.9""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT o_orderkey, o_totalprice,
              |  (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
              |FROM orders o
              |WHERE o_totalprice >= (SELECT MAX(o_totalprice) FROM orders) * 0.9""".stripMargin)
    },

    // LATERAL correlated subquery (Spark 3.2+ lateral join): per-nation
    // top-2 customers by balance. Catalyst decorrelates the LIMIT'd
    // correlated subquery into a ranked join — the declarative form of the
    // grouped-top-k pattern (cf. l2_topk_custom_operator). DuckDB runs the
    // identical SQL.
    QueryDef("sql4_lateral_join",
      "LATERAL correlated subquery: top-2 customers per nation (ORDER BY + LIMIT inside LATERAL)",
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
              |FROM nation n, LATERAL (
              |  SELECT c_name, c_acctbal FROM customer c
              |  WHERE c.c_nationkey = n.n_nationkey
              |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
    },

    // ---- A: aggregations -------------------------------------------------
    QueryDef("a1_global_mean",
      "global scalar aggregate (mean, ref R:102); decimal-exact sum / count for bit-stable result",
      "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal FROM customer") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .agg((decSum(col("c_acctbal"), 18, 2) / count(lit(1))).alias("avg_acctbal"))
    },

    QueryDef("a2_grouped_count",
      "grouped count + sum (gold-layer aggregate shape, ref M:162-166)",
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag, l_linestatus") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).alias("cnt"), sum(col("l_quantity")).alias("sum_qty"))
    },

    QueryDef("a3_count_action",
      "COUNT(*) action (ref D:55 et al.)",
      "SELECT COUNT(*) AS n_rows FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem").agg(count(lit(1)).alias("n_rows"))
    },

    QueryDef("a4_drop_duplicates",
      "dropDuplicates / full-row distinct (ref D:177)",
      "SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .dropDuplicates()
    },

    QueryDef("a5_tpch_q1",
      "multi-aggregate grouped report (TPC-H Q1 shape; decimal-exact money sums)",
      """SELECT l_returnflag, l_linestatus,
        |SUM(l_quantity) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
        |SUM(l_quantity) / COUNT(*) AS avg_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |COUNT(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).alias("sum_qty"),
          decSum(col("l_extendedprice"), 18, 2).alias("sum_base_price"),
          decSum(disc, 20, 4).alias("sum_disc_price"),
          decSum(disc * (lit(1) + col("l_tax")), 22, 6).alias("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).alias("avg_qty"),
          (decSum(col("l_extendedprice"), 18, 2) / count(lit(1))).alias("avg_price"),
          count(lit(1)).alias("cnt"))
    },

    QueryDef("a7_count_distinct",
      "exact COUNT(DISTINCT) per group",
      "SELECT event_type, COUNT(DISTINCT user_id) AS users FROM events GROUP BY event_type") { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).alias("users"))
    },

    // The sketch itself differs from DuckDB's, so the estimate can't be
    // recomputed by the oracle — instead the ESTIMATE is staged and BOTH
    // engines verify the ±3·rsd error contract against the exact distinct
    // count (rsd = 0.02 as requested below): the hash check now proves the
    // estimate and its bound, not just a row count.
    QueryDef("a6_approx_count_distinct",
      "approx_count_distinct (HLL++, rsd 0.02): staged estimate + oracle-checked ±3·rsd bound vs exact distinct",
      s"""SELECT s.event_type, s.approx_users,
         |  ABS(s.approx_users - e.exact_users) <= 3 * 0.02 * e.exact_users AS within_bound
         |FROM read_parquet('${QueryDef.StageSql}/a6_est/*.parquet') s
         |JOIN (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
         |      FROM events GROUP BY event_type) e USING (event_type)""".stripMargin) { (s, dir) =>
      val stage = QueryDef.stageDir(dir)
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).alias("approx_users"))
        .write.mode("overwrite").parquet(s"$stage/a6_est")
      val exact = Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).alias("exact_users"))
      s.read.parquet(s"$stage/a6_est").join(exact, "event_type")
        .select(col("event_type"), col("approx_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            lit(3 * 0.02) * col("exact_users")).alias("within_bound"))
    },

    // ---- L: sort / limit / top-k -----------------------------------------
    QueryDef("l1_topk",
      "orderBy + limit top-k (ref L1 D:182; made deterministic with key tie-break)",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10") { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    },

    // ---- SET: union / intersect / except ---------------------------------
    QueryDef("set1_union_all",
      "UNION ALL of two tagged projections",
      "SELECT c_custkey AS id, 'customer' AS kind FROM customer WHERE c_acctbal > 5000 UNION ALL SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier") { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").alias("id"), lit("customer").alias("kind"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").alias("id"), lit("supplier").alias("kind"))
      c.union(sup)
    },

    QueryDef("set2_intersect",
      "INTERSECT (distinct) of key sets",
      "SELECT c_custkey FROM customer INTERSECT SELECT o_custkey AS c_custkey FROM orders") { (s, dir) =>
      Tables.load(s, dir, "customer").select("c_custkey")
        .intersect(Tables.load(s, dir, "orders").select(col("o_custkey").alias("c_custkey")))
    },

    QueryDef("set3_except",
      "EXCEPT (distinct): customer keys with no orders",
      "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders") { (s, dir) =>
      Tables.load(s, dir, "customer").select("c_custkey")
        .except(Tables.load(s, dir, "orders").select(col("o_custkey").alias("c_custkey")))
    },

    QueryDef("set4_intersect_all",
      "INTERSECT ALL (multiset semantics)",
      "SELECT l_orderkey FROM lineitem INTERSECT ALL SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select("l_orderkey")
        .intersectAll(li.filter(col("l_linenumber") <= 2).select("l_orderkey"))
    },

    QueryDef("set5_except_all",
      "EXCEPT ALL (multiset semantics)",
      "SELECT l_orderkey FROM lineitem EXCEPT ALL SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select("l_orderkey")
        .exceptAll(li.filter(col("l_linenumber") <= 2).select("l_orderkey"))
    },

    // unionByName: schema-aligned union for frames whose column ORDER
    // differs — positional UNION would silently pair k with v here.
    QueryDef("set6_union_by_name",
      "unionByName across different column orders (UNION ALL BY NAME)",
      """SELECT c_custkey AS k, c_acctbal AS v FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL BY NAME
        |SELECT o_totalprice AS v, o_custkey AS k FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").alias("k"), col("c_acctbal").alias("v"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_totalprice").alias("v"), col("o_custkey").alias("k"))
      c.unionByName(o)
    }
  )
}
