package graft

import org.apache.spark.sql.functions._

import graft.ext.PipelineOps

/** Temperature-mixing rate derivation: the α-dial's exact invariants, the
  * budget identity, the cap, and deterministic application. */
class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // sources with 10:3:1 token-mass skew
  private val docs = (
    (1 to 100).map(i => (i.toLong, "web", 100L)) ++
    (1 to 30).map(i => (1000L + i, "books", 100L)) ++
    (1 to 10).map(i => (2000L + i, "code", 100L))
  ).toDF("doc_id", "source", "n_chars")

  test("alpha=1 is proportional: every source keeps exactly budgetFrac") {
    val r = PipelineOps.temperatureRates(docs, "source", "n_chars",
      alpha = 1.0, budgetFrac = 0.4)
    assert(r.keySet === Set("web", "books", "code"))
    r.values.foreach(v => assert(math.abs(v - 0.4) < 1e-12))
  }

  test("alpha=0 splits the budget evenly across sources") {
    // budget = 0.4 × 14000 tokens; each of 3 sources targets 1866.7 tokens
    val r = PipelineOps.temperatureRates(docs, "source", "n_chars",
      alpha = 0.0, budgetFrac = 0.4)
    assert(math.abs(r("web") - 1866.666 / 10000) < 1e-4)
    assert(math.abs(r("books") - 1866.666 / 3000) < 1e-4)
    assert(math.abs(r("code") - 1.0) < 1e-12) // capped: target > available
  }

  test("alpha=0.5 upsamples small sources relative to proportional; budget holds") {
    val r = PipelineOps.temperatureRates(docs, "source", "n_chars",
      alpha = 0.5, budgetFrac = 0.4)
    assert(r("code") > r("books") && r("books") > r("web"))
    // uncapped ⇒ Σ rate_s·T_s = budget exactly
    val spent = r("web") * 10000 + r("books") * 3000 + r("code") * 1000
    assert(math.abs(spent - 0.4 * 14000) < 1e-6)
  }

  test("application is deterministic and roughly hits the per-source targets") {
    val r = PipelineOps.temperatureRates(docs, "source", "n_chars",
      alpha = 0.5, budgetFrac = 0.5)
    val once = PipelineOps.temperatureMix(docs, "doc_id", "source", r)
      .select("doc_id").as[Long].collect().sorted
    val again = PipelineOps.temperatureMix(docs, "doc_id", "source", r)
      .select("doc_id").as[Long].collect().sorted
    assert(once === again)
    assert(once.nonEmpty && once.length < 140)
  }
}
