package graft

import graft.ops.TxLog

/** Auto-checkpointing (Delta's checkpointInterval): every Nth commit
  * snapshots the active file list so readers replay a bounded log tail
  * — no operator-run compact() needed on long-lived tables. */
class AutoCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def checkpointFiles(t: String): Seq[String] =
    java.nio.file.Files.list(java.nio.file.Paths.get(t, "_txlog"))
      .iterator().asScala().map(_.getFileName.toString)
      .filter(_.endsWith(".checkpoint.json")).toSeq.sorted

  implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  test("a checkpoint lands automatically at the default interval") {
    val t = tmpDir("autocp") + "/t"
    (1 to 10).foreach(i => TxLog.append(Seq((i.toLong, s"v$i"))
      .toDF("k", "v").coalesce(1), t))
    assert(checkpointFiles(t).exists(_.contains("0000000010")),
      s"expected a v10 checkpoint, got ${checkpointFiles(t)}")
    // reads replay from the checkpoint; history stays time-travelable
    assert(TxLog.read(spark, t).count() === 10)
    assert(TxLog.read(spark, t, Some(3L)).count() === 3)
  }

  test("graft.checkpoint.interval overrides; 0 disables") {
    val t = tmpDir("autocp") + "/n3"
    TxLog.setProperties(t, Map("graft.checkpoint.interval" -> "3")) // v1
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)                  // v2
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)                  // v3
    assert(checkpointFiles(t).exists(_.contains("0000000003")))
    val off = tmpDir("autocp") + "/off"
    TxLog.setProperties(off, Map("graft.checkpoint.interval" -> "0"))
    (1 to 12).foreach(i => TxLog.append(Seq((i.toLong, "x"))
      .toDF("k", "v").coalesce(1), off))
    assert(checkpointFiles(off).isEmpty)
  }
}
