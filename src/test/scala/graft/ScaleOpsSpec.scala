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

  test("custom TopKPerKey operator equals the window top-k") {
    val li = Tables.load(spark, SF, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    }
    val viaCustom = graft.ops.TopK.perKey(li, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .select("l_returnflag", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaCustom === viaWindow)
    assert(viaCustom.size === 9) // 3 flags × 3
    // and the custom exec is actually in the plan
    val plan = graft.ops.TopK.perKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false)), 3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("TopKPerKey spill path: forced chunk spills still equal the window top-k exactly") {
    val rnd = new scala.util.Random(7)
    // keys interleaved so every key's rows straddle several spill chunks
    val rows = Seq.tabulate(8000)(i =>
      (rnd.nextInt(300).toLong, rnd.nextInt(100).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // maxKeysInMemory=16 forces dozens of spills per partition
    val viaSpill = graft.ops.TopK.perKey(df, Seq("key"),
        Seq(("score", false), ("id", true)), 3, maxKeysInMemory = 16)
      .select("key", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSpill === viaWindow)
  }

  test("TopKPerKey memory guard: 1M distinct keys in ONE partition complete under a bounded heap") {
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val n = 1000000L
      // two rows per key — the kept row must be the even (smaller-ord) one
      val df = spark.range(0, 2 * n)
        .select((col("id") % n).alias("key"), col("id").alias("ord"))
      // 64k-key cap → ~15 spill chunks of ≤64k×1 rows; the merge holds
      // O(chunks × k) rows, never the 1M-key heap map
      val out = graft.ops.TopK.perKey(df, Seq("key"), Seq(("ord", true)), 1,
        maxKeysInMemory = 1 << 16)
      assert(out.count() === n)
      assert(out.filter(col("ord") >= n).count() === 0L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("TopKPerKey property: equals window top-k on random data for k in {1,3,10}") {
    val rnd = new scala.util.Random(99)
    // duplicate scores included deliberately — tie-break on id must decide
    val rows = Seq.tabulate(5000)(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id")
    for (k <- Seq(1, 3, 10)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("score").desc, col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("key", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaCustom = graft.ops.TopK.perKey(df, Seq("key"),
          Seq(("score", false), ("id", true)), k)
        .select("key", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaCustom === viaWindow, s"k=$k")
    }
  }

  test("PushFilterThroughTopK: key-only filter reaches the parquet scan") {
    val li = Tables.load(spark, SF, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val filteredAfter = graft.ops.TopK.perKey(li, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .filter(col("l_returnflag") === "R")
    val plan = filteredAfter.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), plan)
    // semantics unchanged: equals filter-before-topk
    val before = graft.ops.TopK.perKey(
        li.filter(col("l_returnflag") === "R"), Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val after = filteredAfter.select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after === before)
    assert(after.size === 3)
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
