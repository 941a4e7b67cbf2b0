package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Connected components over near-dup pairs: transitive closure across
  * multi-hop chains (the case pair-wise dedup gets wrong), cluster
  * separation, survivor selection, and the loud non-convergence guard. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)], maxIters: Int = 100) =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b",
        maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain clusters transitively even though its ends never paired") {
    // 1-2, 2-3, 3-4: near-dup candidates A≈B, B≈C, C≈D where A,D were
    // never a candidate pair — all four must land in one cluster
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate clusters keep separate canonical ids; order is immaterial") {
    val got = comps(Seq((20L, 10L), (30L, 20L), (5L, 6L), (100L, 50L)))
    assert(got === Map(
      10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 6L -> 5L,
      50L -> 50L, 100L -> 50L))
  }

  test("dropNearDuplicates keeps one survivor per cluster, unpaired rows untouched") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (7L, "unique"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 7L))
  }

  test("non-convergence throws instead of returning partial labels") {
    // a 12-hop path needs ~11 propagation rounds; cap at 3 must be loud
    val path = (1L until 12L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](comps(path, maxIters = 3))
    // and with an adequate cap the same path converges to min id 1
    val ok = comps(path)
    assert(ok.values.toSet === Set(1L))
    assert(ok.keySet === (1L to 12L).toSet)
  }
}
