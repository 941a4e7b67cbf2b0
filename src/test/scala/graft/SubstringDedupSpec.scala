package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Substring-level (duplicate-span) dedup — the Lee et al. 2022 exact-
  * substring shape: corpus-wide repeated k-token windows, merged per
  * document into maximal spans, plus the scrub that removes them. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  // d1/d2 share the run "one two three four" (two overlapping 3-windows);
  // d3 is unique; d4 repeats its own 4-token phrase internally
  private def corpus = Seq(
    (1L, "one two three four five"),
    (2L, "zzz one two three four qqq"),
    (3L, "totally unique words here"),
    (4L, "p q r s p q r s")).toDF("doc_id", "text")

  test("duplicateSpans merges overlapping windows and counts covered tokens") {
    val cov = Dedup.duplicateSpans(
      Dedup.windowHashes(corpus, "doc_id", "text", k = 3), k = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // d1: dup windows at pos 0,1 → one span, 4 tokens covered
    assert(cov(1L) === ((2L, 1L, 4L)))
    // d2: dup windows at pos 1,2 → one span, 4 tokens
    assert(cov(2L) === ((2L, 1L, 4L)))
    // d3: clean — absent from the frame
    assert(!cov.contains(3L))
    // d4: "p q r" and "q r s" each occur twice WITHIN the doc → dup
    // positions 0,1,4,5 → two spans, all 8 tokens covered
    assert(cov(4L) === ((4L, 2L, 8L)))
  }

  test("scrubDuplicateSpans removes exactly the covered tokens") {
    val out = Dedup.scrubDuplicateSpans(corpus, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "five")
    assert(out(2L) === "zzz qqq")
    assert(out(3L) === "totally unique words here") // untouched, verbatim
    assert(out(4L) === "")                          // fully duplicated
  }

  test("scrub keeps the caller's id column even when it is named 'id'") {
    val renamed = corpus.withColumnRenamed("doc_id", "id")
    val out = Dedup.scrubDuplicateSpans(renamed, "id", "text", k = 3)
    assert(out.columns.toSeq === Seq("id", "text"))
    assert(out.filter(col("id") === 1L).select("text")
      .as[String].head() === "five")
  }

  test("adversarial all-duplicated document: linear merge walk, exact result") {
    // 2000 tokens of a repeated 10-token phrase — every window duplicated,
    // so the starts array is ~2000 entries; the old HOF form rescanned it
    // per token (O(tokens × starts)), the native walk is one pass. A
    // trailing unique sentinel must survive: the last duplicated window
    // starts at pos 1990 (covers 1990..1999), so tokens 2000.. are kept.
    val phrase = (0 until 10).map(i => s"w$i").mkString(" ")
    val big = Seq.fill(200)(phrase).mkString(" ") + " unique1 unique2 unique3"
    val df = Seq((1L, big), (2L, phrase)).toDF("doc_id", "text")
    val out = Dedup.scrubDuplicateSpans(df, "doc_id", "text", k = 10)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "unique1 unique2 unique3")
    // d2 holds ONE occurrence of the phrase but its single window matches
    // d1's corpus-wide — scrubbed empty
    assert(out(2L) === "")
  }

  test("scrub_covered_tokens boundary semantics: covered iff a start in (i-k, i]") {
    GraftFunctions.register(spark)
    // starts = [2], k = 2 → covered tokens are 2 and 3 only
    val r = spark.sql(
      "SELECT scrub_covered_tokens(array('a','b','c','d','e'), array(2), 2)")
      .as[Seq[String]].head()
    assert(r === Seq("a", "b", "e"))
    // empty starts: everything kept; null starts array: NULL out
    assert(spark.sql(
      "SELECT scrub_covered_tokens(array('a'), CAST(array() AS ARRAY<INT>), 3)")
      .as[Seq[String]].head() === Seq("a"))
    assert(spark.sql(
      "SELECT scrub_covered_tokens(array('a'), CAST(NULL AS ARRAY<INT>), 3)")
      .as[Option[Seq[String]]].head().isEmpty)
  }

  test("span detection is an equi-join + window — no cartesian product") {
    val cov = Dedup.duplicateSpans(
      Dedup.windowHashes(corpus, "doc_id", "text", k = 3), k = 3)
    val plan = cov.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
