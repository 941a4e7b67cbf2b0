package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ext.{PipelineOps, TfIdf}

/** Round-5 breadth: subquery rewrites, null-safe joins, exact-moment
  * statistics, duplicated-span detection, incremental IDF, and the
  * parquet MERGE — correctness corners the DuckDB gate can't see, plus
  * the plan properties that make each survive 100 TB.
  */
class BreadthR5Spec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, SF)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("EXISTS/IN subqueries rewrite to semi/anti hash joins, never nested-loop") {
    val p = plan("sql2_exists_subquery")
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("null-safe join matches NULL keys instead of dropping them") {
    val out = SparkEntry.queries("j8_join_null_safe")(spark, SF)
    val enDocs = Tables.load(spark, SF, "documents")
      .filter(col("lang") === "en").count()
    // 'en' rows carry a NULL key; they must all survive with the DEFAULT label
    assert(out.filter(col("label") === "DEFAULT").count() === enDocs)
    assert(out.count() ===
      Tables.load(spark, SF, "documents").count())
  }

  test("exact-moment statistics match Spark's own corr/var within 1e-9") {
    val out = SparkEntry.queries("a14_stats_moments")(spark, SF)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val ref = Tables.load(spark, SF, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_linenumber").cast("double"),
          col("l_quantity")).alias("c"),
        var_pop(col("l_quantity")).alias("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    for ((k, (c, v)) <- ref) {
      assert(math.abs(out(k)._1 - c) < 1e-9, s"corr $k")
      assert(math.abs(out(k)._2 - v) < 1e-9, s"var $k")
    }
  }

  test("duplicated-span counts never exceed the doc's span total") {
    val out = PipelineOps.duplicatedSpans(
      Tables.load(spark, SF, "documents"), "doc_id", "text", n = 5)
    assert(out.filter(col("n_dup") > col("n_spans")).count() === 0)
    // every reported doc shares at least one span — and a planted clone
    // pair is always caught
    assert(out.filter(col("n_dup") < 1).count() === 0)
    val docs = Tables.load(spark, SF, "documents").limit(2)
    val cloned = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 10000))
    val dup = PipelineOps.duplicatedSpans(cloned, "doc_id", "text", n = 5)
    // clones duplicate every span of their source
    assert(dup.filter(col("n_dup") === col("n_spans")).count() === 4)
  }

  test("incremental IDF equals the from-scratch IDF on the merged corpus") {
    val docs = Tables.load(spark, SF, "documents")
    val base = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)
    val n = docs.count()
    val inc = TfIdf.mergeIdf(Seq(
        TfIdf.docFreq(TfIdf.tokenized(base, "doc_id", "text")),
        TfIdf.docFreq(TfIdf.tokenized(batch, "doc_id", "text"))), n)
      .select("token", "df", "idf_micro")
    val scratch = TfIdf.docFreq(TfIdf.tokenized(docs, "doc_id", "text"))
      .select(col("token"), col("df"),
        round(log(lit(n.toDouble) / col("df")) * 1e6).cast("long")
          .alias("idf_micro"))
    assert(inc.exceptAll(scratch).count() === 0)
    assert(scratch.exceptAll(inc).count() === 0)
  }

  test("mergeIdf is one grouped sum: partial aggregation, single shuffle") {
    val docs = Tables.load(spark, SF, "documents")
    val p = TfIdf.mergeIdf(Seq(
        TfIdf.docFreq(TfIdf.tokenized(docs.filter(col("doc_id") < 300), "doc_id", "text")),
        TfIdf.docFreq(TfIdf.tokenized(docs.filter(col("doc_id") >= 300), "doc_id", "text"))), 500L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("partial_sum"), p)
  }

  test("upsert MERGE: updated keys take v2, new keys insert, others untouched") {
    val out = SparkEntry.queries("ext_upsert_merge")(spark, SF)
    val cust = Tables.load(spark, SF, "customer")
    val nCust = cust.count()
    val nNew = cust.filter(pmod(col("c_custkey"), lit(7)) === 0).count()
    assert(out.count() === nCust + nNew)
    // every %5 key carries version 2 (update won); no one else does
    assert(out.filter(col("version") === 2).count() ===
      cust.filter(pmod(col("c_custkey"), lit(5)) === 0).count())
    assert(out.filter(col("version") === 2 &&
      pmod(col("c_custkey"), lit(5)) =!= 0).count() === 0)
  }

  test("higher-order-function entries are pure scan-side projections (no exchange)") {
    for (name <- Seq("f21_array_funcs", "f22_higher_order")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles: $p")
    }
  }
}
