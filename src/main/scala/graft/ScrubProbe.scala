package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Dev-tool main (VERDICT r14 "what's wrong" item 3): adversarial
  * substring-scrub scaling probe, printed as PERF.md table rows.
  *
  * Corpus: documents that are ONE phrase repeated wall-to-wall — every
  * k-token window is duplicated, so the per-document duplicated-starts
  * array is as long as the document. The old HOF coverage test
  * (`exists` per token over the starts array) was O(tokens × starts)
  * per document on exactly this shape; the native
  * [[graft.functions.ScrubCoveredTokens]] merge walk is O(tokens +
  * starts). Quadrupling document LENGTH at constant document count
  * multiplies the quadratic form's work ×16 and the linear form's ×4 —
  * the printed ratio is the evidence. */
object ScrubProbe {

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("local[8]", shufflePartitions = 8)
    import spark.implicits._
    GraftFunctions.register(spark)

    val phrase = (0 until 10).map(i => s"w$i").mkString(" ")
    def corpus(nDocs: Int, phraseReps: Int) =
      (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(phraseReps)(phrase).mkString(" ") +
          s" unique_${i}_a unique_${i}_b")
      }.toDF("doc_id", "text").repartition(8)

    def timeScrub(nDocs: Int, phraseReps: Int): (Double, Long) = {
      val df = corpus(nDocs, phraseReps)
      df.count() // materialize input outside the timed region
      val t0 = System.nanoTime()
      val n = Dedup.scrubDuplicateSpans(df, "doc_id", "text", k = 10)
        .filter(length(col("text")) > 0).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    timeScrub(50, 50) // JIT + codegen warmup, untimed

    val (t1x, n1) = timeScrub(200, 500)   // 5 000 tokens/doc, all dup
    val (t4x, n4) = timeScrub(200, 2000)  // 20 000 tokens/doc, all dup
    require(n1 == 200 && n4 == 200, s"scrub must keep the sentinels: $n1/$n4")
    println(f"PROBE_SCRUB|docs=200|tokensPerDoc=5000->20000 (x4)|" +
      f"wall1x=$t1x%.2fs|wall4x=$t4x%.2fs|ratio=${t4x / t1x}%.2fx|" +
      "quadraticWouldBe=16x")
    Graft.shutdown(spark)
  }
}
