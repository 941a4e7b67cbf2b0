package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.ops.Skew

/** Scale-tooling specs: typed top-k aggregator (bounded partial agg) and
  * salted skew join — both must be result-identical to their naive
  * formulations. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAggregator equals the window row_number top-k") {
    val emb = Tables.load(spark, SF, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val viaWindow = graft.ext.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    graft.functions.GraftFunctions.register(spark)
    val topk = udaf(new TopKAggregator(3))
    val q = queries.select(col("vec_id").alias("q_id"), col("embedding").alias("q_vec"))
    val scored = emb
      .select(col("vec_id").alias("n_id"), col("embedding").alias("n_vec"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.VectorFunctions.cosineNative(col("q_vec"), col("n_vec")).alias("score"))
    val viaAgg = scored.groupBy("q_id")
      .agg(topk(col("n_id"), col("score")).alias("top"))
      .select(col("q_id"), explode(col("top")).alias("t"))
      .select(col("q_id"), col("t._1").alias("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaAgg === viaWindow)
  }

  test("salted join equals the plain join") {
    val orders = Tables.load(spark, SF, "orders")
    val customer = Tables.load(spark, SF, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(plain.size === 1500)
  }
}
