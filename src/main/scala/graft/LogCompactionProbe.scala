package graft

import java.nio.file.{Files, Path, Paths}

import graft.ops.TxLog

/** Dev-tool main: log-compaction scaling probe, printed as PERF.md
  * rows. Builds a trickle-written table (one tiny commit per append —
  * the streaming steady state), then measures a COLD metadata fold
  * (directory listing + JSON parse of every commit) before and after
  * [[TxLog.compactLog]]. Cold cost is isolated by copying the log to a
  * fresh path each time (the commit-parse cache keys by path). At a
  * commit a minute, a year-old table holds ~500k loose files — the
  * listing+open() cost this probe scales is the one compaction caps. */
object LogCompactionProbe {

  private def copyTable(src: String, dst: String): Unit = {
    val s = Paths.get(src)
    TxLog.walkDir(s).foreach { p =>
      val rel = s.relativize(p)
      val t = Paths.get(dst).resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def timeColdFold(table: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = TxLog.commits(table).size
    (n, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(20000)
    // WIDE mode (2nd arg > 1): many files per commit — probes the
    // single-JSON full-state checkpoint at the metadata-plane ceiling
    // (guardMetadataPlane's 200k active files): how long a checkpoint
    // WRITE takes, how big it is, and what a cold fold from it costs.
    // The answer decides whether multi-part checkpoints (Delta's shape
    // for object stores) are worth building.
    val filesPerCommit = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val root = Files.createTempDirectory("graft_logprobe").toString
    val t = s"$root/t"
    // synthesize the log shape directly (the fold under test parses
    // JSON commit records; it never opens the data files) — a real
    // trickle writer produces exactly these, one per micro-batch
    Files.createDirectories(Paths.get(t, "_txlog"))
    (1 to nCommits).foreach { i =>
      // the first commit carries schema + a property so the metadata
      // folds under test have real content to find
      val extra = if (i == 1)
        ""","schemaDdl":"k BIGINT,v STRING","properties":{"p":"v"}"""
      else ""
      val fs = (0 until filesPerCommit).map(j => s"d-x/part-$i-$j.parquet")
      Files.write(Paths.get(t, "_txlog", f"$i%020d.json"),
        (s"""{"protocolVersion":1,"version":$i,"op":"append",""" +
          s""""batchId":-1,"add":[${fs.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""remove":[],"sizes":{${fs.map(f =>
            "\"" + f + "\":1048576").mkString(",")}},"ts":${1000000 + i}""" +
          extra + "}").getBytes)
    }
    if (filesPerCommit > 1) {
      // wide probe: checkpoint write cost + size + cold fold from it.
      // 3rd arg = partMaxFiles: split into Delta-style multi-part
      // checkpoints and report the set shape instead of one JSON.
      args.drop(2).headOption.foreach(pm =>
        sys.props.put("graft.checkpoint.partMaxFiles", pm))
      sys.props.put("graft.txlog.maxActiveFiles", "0") // probe past default
      val w0 = System.nanoTime()
      TxLog.compact(t)
      val wMs = (System.nanoTime() - w0) / 1e6
      val cps = TxLog.walkDir(Paths.get(t, "_txlog")).filter(p =>
        p.getFileName.toString.endsWith(".checkpoint.json") ||
          p.getFileName.toString
            .matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.json"""))
      val cpMb = cps.map(Files.size).sum / 1e6
      val maxPartMb = cps.map(Files.size).max / 1e6
      val cold = s"$root/cold"; copyTable(t, cold)
      val r0 = System.nanoTime()
      val n = TxLog.activeFiles(cold).size
      val rMs = (System.nanoTime() - r0) / 1e6
      sys.props.remove("graft.checkpoint.partMaxFiles")
      println(f"| active files | parts | checkpoint write | total size | largest part | cold stateAt fold |")
      println(f"| $n | ${cps.size} | $wMs%.0f ms | $cpMb%.1f MB | $maxPartMb%.1f MB | $rMs%.0f ms |")
      return
    }
    def looseCount(p: String): Int =
      TxLog.walkDir(Paths.get(p, "_txlog"))
        .count(_.getFileName.toString.matches("""\d{20}\.json"""))

    // cold METADATA folds (properties + schema + active files): before
    // any checkpoint these parse the whole history; after compactLog the
    // v6-floor FULL-STATE checkpoint answers them from one checkpoint
    // JSON plus the loose tail — O(active + tail), not O(history-bytes)
    def timeColdMeta(table: String): Double = {
      val t0 = System.nanoTime()
      TxLog.properties(table); TxLog.schemaAsOf(table)
      TxLog.activeFiles(table)
      (System.nanoTime() - t0) / 1e6
    }
    val pre = s"$root/pre"; copyTable(t, pre)
    val (n1, ms1) = timeColdFold(pre)
    val preM = s"$root/preM"; copyTable(t, preM)
    val msM1 = timeColdMeta(preM)
    TxLog.compactLog(t)
    val post = s"$root/post"; copyTable(t, post)
    val (n2, ms2) = timeColdFold(post)
    val postM = s"$root/postM"; copyTable(t, postM)
    val msM2 = timeColdMeta(postM)
    println(f"| commits | loose files | cold commits() fold | cold props+schema+files |")
    println(f"| $n1 | ${looseCount(pre)} | $ms1%.0f ms | $msM1%.0f ms |")
    println(f"| $n2 (compacted) | ${looseCount(post)} | $ms2%.0f ms | $msM2%.0f ms |")
    println(f"ratio: commits ${ms1 / ms2}%.2f x, metadata ${msM1 / msM2}%.2f x")
  }
}
