package graft.ops

import java.nio.file.{Files, Path, Paths}


/** Disk-memoized builders for IMMUTABLE catalog-entry fixtures.
  *
  * Why: most txlog entries spend their wall clock BUILDING a table
  * (appends, DDL, trickle commits) and only a fraction actually running
  * the operator under test — and Bench runs every entry twice per
  * invocation (concurrent + sequential passes), Verify once more, and
  * the gate takes min-of-3 bench runs. Rebuilding a deterministic
  * fixture every time is pure fixture-dominance noise (the 78–178 s
  * run-to-run band PERF.md documents). Staging it ONCE per
  * (sf, key, version) under [[QueryDef.StageRoot]] makes every later
  * run O(read) and the gate's variance collapse.
  *
  * Contract:
  *   - the build lambda must be DETERMINISTIC given the sf dir (same
  *     rows, same layout decisions) and the fixture must be READ-ONLY
  *     afterwards — an entry that mutates its table goes through
  *     [[mutableCopy]] (file copy of a cached base, then mutate the
  *     copy) or builds fresh;
  *   - **bump `version` whenever the build lambda changes** — the cache
  *     key is (sf, key, version), nothing content-hashes the lambda, and
  *     a stale on-disk fixture would silently poison both Verify and
  *     Bench. This is the same discipline as a schema version;
  *   - crash-safe: the `_READY` marker is written LAST; a dir without it
  *     (killed mid-build) is wiped and rebuilt;
  *   - thread-safe within a JVM (Bench's concurrent pass): one build per
  *     key, racers block on the same monitor. Cross-process races are
  *     not handled — the harness runs Verify/Bench serially.
  */
object Fixtures {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def deleteRecursively(p: Path): Unit =
    TxLog.walkDir(p).reverse.foreach(Files.deleteIfExists)

  /** Fingerprint of the sf dir's parquet inputs (relative path, size,
    * mtime per file): the driver REGENERATES testdata between rounds, and
    * a fixture cached against the old bytes would silently diverge from
    * the oracle reading the new ones. Baking the fingerprint into the
    * cache key turns regeneration into one rebuild, never a misread.
    * Memoized per (sfDir, JVM) — one directory walk per process. */
  private val sigCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def inputSig(sfDir: String): String =
    sigCache.getOrElseUpdate(sfDir, {
      val base = Paths.get(sfDir)
      val lines = TxLog.walkDir(base).filter(Files.isRegularFile(_))
        .map(p => s"${base.relativize(p)}|${Files.size(p)}|${
          Files.getLastModifiedTime(p).toMillis}")
        .sorted.mkString("\n")
      val d = java.security.MessageDigest.getInstance("SHA-1")
        .digest(lines.getBytes("UTF-8"))
      d.take(6).map("%02x".format(_)).mkString
    })

  /** Build-once immutable fixture table: returns the cached path,
    * running `build(tablePath)` only when the (sf-fingerprint, key,
    * version) slot is absent or incomplete. Stale slots for the same key
    * (older version or regenerated testdata) are deleted on build. */
  def immutableTable(sfDir: String, key: String, version: Int)(
      build: String => Unit): String = {
    val sfName = new java.io.File(sfDir).getName
    val parent = Paths.get(QueryDef.StageRoot, "fixtures", sfName)
    val slot = s"${key}_v${version}_${inputSig(sfDir)}"
    val root = parent.resolve(slot)
    val ready = root.resolve("_READY")
    val lock = locks.computeIfAbsent(root.toString, _ => new Object)
    lock.synchronized {
      if (!Files.exists(ready)) {
        if (Files.isDirectory(parent)) // expire this key's stale slots
          TxLog.listDir(parent)
            .filter(_.getFileName.toString.startsWith(s"${key}_v"))
            .foreach(deleteRecursively)
        Files.createDirectories(root)
        build(root.resolve("t").toString)
        Files.write(ready, Array.emptyByteArray)
      }
    }
    root.resolve("t").toString
  }

  /** Write-once ORACLE INPUT staging: entries stage a deterministic
    * projection of a testdata table to [[QueryDef.stageDir]] so the
    * DuckDB oracle reads byte-identical inputs — and then rewrite it
    * every run. Skip the rewrite when a marker for (sub, version,
    * input-fingerprint) already exists; the staged PATH is unchanged, so
    * oracle SQL needs no edits. The marker lives OUTSIDE the staged dir
    * (the overwrite wipes the dir) and embeds the sf fingerprint, so a
    * testdata regeneration re-stages. Same version-bump discipline as
    * [[immutableTable]]: bump when the projection changes. */
  def stagedInput(sfDir: String, sub: String, version: Int)(
      df: => org.apache.spark.sql.DataFrame): String = {
    val stage = QueryDef.stageDir(sfDir)
    val path = s"$stage/$sub"
    val marker = Paths.get(stage, ".ready", s"${sub}_v${version}_${inputSig(sfDir)}")
    val lock = locks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!Files.exists(marker)) {
        df.write.mode("overwrite").parquet(path)
        Files.createDirectories(marker.getParent)
        // stale markers for the same sub (older version / regenerated
        // testdata) die with the rewrite
        TxLog.listDir(marker.getParent)
          .filter(_.getFileName.toString.startsWith(s"${sub}_v"))
          .foreach(Files.deleteIfExists)
        Files.write(marker, Array.emptyByteArray)
      }
    }
    path
  }

  /** Call-site sugar for [[stagedInput]]:
    * `df.stageInput(dir, "x_in")` replaces
    * `df.write.mode("overwrite").parquet(s"$stage/x_in")` one-for-one —
    * same path, write skipped when the staged copy is current. */
  implicit class StagedInputOps(private val df: org.apache.spark.sql.DataFrame)
      extends AnyVal {
    def stageInput(sfDir: String, sub: String, version: Int = 1): String =
      stagedInput(sfDir, sub, version)(df)
  }

  /** Fresh MUTABLE copy of a cached fixture — mutation entries pay one
    * local file copy (metadata-scale for these fixtures) instead of a
    * Spark rebuild. The copy lands in a fresh temp dir, so concurrent
    * runs never share mutable state. */
  def mutableCopy(srcTable: String, prefix: String): String = {
    val src = Paths.get(srcTable)
    val dst = Files.createTempDirectory(prefix).resolve("t")
    TxLog.walkDir(src).foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
    dst.toString
  }
}
