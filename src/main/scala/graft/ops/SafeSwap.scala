package graft.ops

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe table-directory replacement for plain-parquet lakes (the
  * commit half of [[Upsert]] and [[Maintenance]]).
  *
  * Writers stage the new table at `dir + "_staging"`, then [[commit]]
  * performs: rename(dir → dir_old), rename(dir_staging → dir),
  * delete(dir_old). Every FileSystem call's boolean is checked — a false
  * return is a failed commit, not a shrug. A crash at any point leaves
  * either the old table at `dir`, or the old table at `dir_old` with the
  * target missing; [[checkTarget]] detects that second state on the next
  * run and refuses to treat it as an empty/first-batch table (which is how
  * an unchecked delete-then-rename turns a replayed streaming batch into
  * silent data loss).
  */
object SafeSwap {

  def staging(dir: String): String = dir + "_staging"
  def backup(dir: String): String = dir + "_old"

  /** True iff `dir` exists. Throws if `dir` is missing but a staging or
    * backup dir is present — an interrupted swap needs manual recovery
    * (typically: rename the backup back), not a fresh-table fallback. */
  def checkTarget(fs: FileSystem, dir: String): Boolean = {
    val exists = fs.exists(new Path(dir))
    if (!exists && (fs.exists(new Path(backup(dir))) ||
        fs.exists(new Path(staging(dir)))))
      throw new IOException(
        s"$dir is missing but ${backup(dir)} or ${staging(dir)} exists: " +
          "a previous swap was interrupted — recover the backup manually " +
          "instead of reinitializing the table")
    exists
  }

  /** Swap the staged dir into place. `targetExists` is [[checkTarget]]'s
    * result from before the staged write. */
  def commit(fs: FileSystem, dir: String, targetExists: Boolean): Unit = {
    val target = new Path(dir)
    val staged = new Path(staging(dir))
    val bak = new Path(backup(dir))
    def require(ok: Boolean, what: String): Unit =
      if (!ok) throw new IOException(s"$what failed — table left at: " +
        s"target=${fs.exists(target)} backup=${fs.exists(bak)}")
    // a stale backup can only exist from a crash AFTER the new table landed
    // (checkTarget would have thrown otherwise) — safe to clear
    if (fs.exists(bak)) require(fs.delete(bak, true), s"delete $bak")
    if (targetExists) require(fs.rename(target, bak), s"rename $target -> $bak")
    require(fs.rename(staged, target), s"rename $staged -> $target")
    if (targetExists) require(fs.delete(bak, true), s"delete $bak")
  }
}
