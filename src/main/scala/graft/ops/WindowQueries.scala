package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Window / analytic functions — extension tier (the reference uses none,
  * SURVEY.md §2.5), but required surface for a complete engine.
  *
  * Determinism rules: every ORDER BY inside a window carries a unique
  * tie-break key; windowed double sums go through DECIMAL so DuckDB's
  * segment-tree aggregation and Spark's running aggregation (different
  * addition orders) still agree bit-for-bit.
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("w1_row_number_topk",
      "row_number partition top-k: top-3 orders by price per market segment",
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    },

    QueryDef("w2_running_sum",
      "running sum per key (decimal-exact so engines agree on order-dependent double adds)",
      """SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_val
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType).alias("run_val"))
    },

    QueryDef("w3_lag_lead",
      "lag / lead row-shift per key",
      """SELECT event_id,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_val,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_val
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          lag(col("value"), 1).over(w).alias("prev_val"),
          lead(col("value"), 1).over(w).alias("next_val"))
    },

    QueryDef("w4_rank_dense_rank",
      "rank + dense_rank with ties",
      """SELECT p_partkey, p_brand,
        |  rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
        |FROM part""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
      Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          rank().over(w).alias("rnk"), dense_rank().over(w).alias("drnk"))
    },

    QueryDef("w5_moving_window_frame",
      "sliding 3-row frame aggregate (decimal-exact)",
      """SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType).alias("sum3"))
    },

    QueryDef("w7_range_frame",
      "RANGE frame over a numeric ordering key (decimal-exact)",
      """SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |  PARTITION BY user_id ORDER BY event_id
        |  RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("event_id"))
        .rangeBetween(-10, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType).alias("range_sum"))
    },

    // Distribution functions: pure rank arithmetic — (rank-1)/(n-1) and
    // rank/n computed from integers in one IEEE division, so the doubles
    // are bit-identical across engines (unlike accumulated float aggs).
    QueryDef("w8_percent_rank_cume",
      "percent_rank / cume_dist over a deterministic per-group order",
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pr,
        |  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd
        |FROM customer""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).alias("pr"),
          cume_dist().over(w).alias("cd"))
    },

    // Value functions with an EXPLICIT full frame: last_value/nth_value
    // under the default frame (RANGE …CURRENT ROW) return the current
    // row's value — the classic silent-wrong-answer; both engines get the
    // full frame spelled out.
    QueryDef("w9_value_functions",
      "first_value / last_value / nth_value over an explicit full frame",
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS best_order,
        |  last_value(o_orderkey) OVER w AS worst_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first_value(col("o_orderkey")).over(w).alias("best_order"),
          last_value(col("o_orderkey")).over(w).alias("worst_order"),
          nth_value(col("o_orderkey"), 2).over(w).alias("second_order"))
    },

    QueryDef("w6_ntile",
      "ntile bucketing over a global order",
      "SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile FROM customer") { (s, dir) =>
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), ntile(4).over(w).alias("quartile"))
    }
  )
}
