package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mview, TxLog}

/** Sizes incremental view maintenance against full recompute — the
  * 100 TB argument for [[graft.ops.Mview]]: an incremental refresh must
  * cost the DELTA (touched files + changed-group view files), not the
  * source snapshot, so the gap should WIDEN with source size at fixed
  * delta.
  *
  * The source models the realistic shape: id-clustered files (range
  * repartition — a time-keyed fact table's natural layout) with recorded
  * id/grp stats, and group keys CORRELATED with the clustering
  * (grp = id div groupSpan — new data lands in recent groups, like a
  * date-grouped rollup). The delta appends one small file and deletes a
  * trailing id range: the maintenance window then touches O(delta)
  * files and O(delta-groups) view rows. An adversarial hash-scattered
  * delta degrades toward full-recompute cost BY DESIGN — that shape is
  * what the full fallback is for.
  *
  * Usage: `runMain graft.MviewProbe [nRows] [nFiles] [deltaRows]`
  * (defaults 2 000 000 / 64 / 2 000). */
object MviewProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val deltaRows = args.drop(2).headOption.map(_.toLong).getOrElse(2000L)
    val groupSpan = math.max(1L, nRows / 1000L)
    val spark = Graft.session("local[8]", shufflePartitions = 32)
    val root = java.nio.file.Files.createTempDirectory("mvprobe").toString
    val t = s"$root/src"

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE|$label|${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    def shaped(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
      (col("id") / groupSpan).cast("long").as("grp"),
      (col("id") % 97L).as("v"))

    timed(s"build source ($nRows rows, $nFiles id-clustered files)") {
      TxLog.overwrite(shaped(spark.range(nRows).toDF())
        .repartitionByRange(nFiles, col("id")).sortWithinPartitions("id"),
        t, statsCols = Seq("id", "grp"))
    }

    val mv = s"$root/mv"
    timed("CREATE sum/count view (full pass, unavoidable)") {
      Mview.create(spark, mv,
        s"SELECT grp, count(*) AS n, sum(v) AS sv FROM txlog.`$t` GROUP BY grp")
    }

    var epoch = 0L
    def mutate(tag: String): Unit = {
      // append one trailing file; delete the range just below it —
      // id-clustered layout localizes both to O(delta) files
      val lo = nRows + epoch * deltaRows
      TxLog.append(shaped(spark.range(lo, lo + deltaRows).toDF()).coalesce(1),
        t, statsCols = Seq("id", "grp"))
      TxLog.delete(spark, t, col("id") >= lo - deltaRows && col("id") < lo)
      epoch += 1
      println(s"PROBE|mutated ($tag): +$deltaRows appended, ~$deltaRows deleted")
    }

    mutate("delta tier")
    timed(s"incremental merge refresh (delta=$deltaRows over $nRows)") {
      val r = Mview.refresh(spark, mv)
      require(r.mode == "incremental_merge", r.mode)
    }
    mutate("full comparison")
    timed("forced FULL refresh (same window shape)") {
      Mview.refresh(spark, mv, full = true)
    }

    val mm = s"$root/mm"
    timed("CREATE minmax view (full pass)") {
      Mview.create(spark, mm,
        s"SELECT grp, max(v) AS mx, min(v) AS mn, count(*) AS n " +
          s"FROM txlog.`$t` GROUP BY grp")
    }
    mutate("recompute tier")
    timed("incremental recompute refresh (touched groups, range-pruned)") {
      val r = Mview.refresh(spark, mm)
      require(r.mode == "incremental_recompute", r.mode)
    }
    mutate("recompute full comparison")
    timed("forced FULL refresh of minmax view") {
      Mview.refresh(spark, mm, full = true)
    }
    spark.stop()
  }
}
