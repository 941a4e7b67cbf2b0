package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Grep gate for the r13 EMFILE class: every `Files.list`/`Files.walk`
  * stream holds a directory fd until CLOSED — the unclosed form leaked
  * one fd per commit-log fold and EMFILE'd the JVM at ~4k commits
  * (PERF.md r13). All directory listing in main sources must go through
  * `TxLog.listDir`/`TxLog.walkDir` (which drain into a List inside
  * try/finally close); this spec keeps a raw call from coming back. */
class FdHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Seq.empty
    walk(root)
  }

  test("no raw Files.list/Files.walk outside TxLog.listDir/walkDir") {
    val root = new File("src/main/scala")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${
      new File(".").getAbsolutePath}")
    val raw = "Files\\.(list|walk)\\(".r
    val offenders = scalaSources(root).flatMap { f =>
      val text = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      val hits = raw.findAllIn(text).size
      // TxLog.scala owns EXACTLY the two wrapped call sites (one inside
      // listDir, one inside walkDir); anywhere else, any hit is a leak
      if (f.getName == "TxLog.scala") {
        if (hits > 2) Some(s"${f.getPath}: $hits raw Files.list/walk " +
          "calls (expected exactly the 2 inside listDir/walkDir)")
        else None
      } else if (hits > 0)
        Some(s"${f.getPath}: $hits raw Files.list/walk call(s) — " +
          "use TxLog.listDir/walkDir (fd-safe)")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
