package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-recoverable directory swap: publish a freshly-written side
  * directory as the live table without a window where the table does not
  * exist.
  *
  * The naive swap (`delete(path); rename(tmp, path)`) loses the ENTIRE
  * table if the process dies between the two calls — and worse, a
  * consumer that distinguishes "fresh table" from "existing table" by
  * `fs.exists` (the snapshot merge in
  * [[graft.streaming.Materialize.snapshotWriter]]) then silently rebuilds
  * from one batch, discarding all prior state. This helper replaces the
  * delete with a rename to a `__backup` sibling, so every crash point
  * leaves either the old directory or its backup on disk, and
  * [[Swap.recover]] can always restore a consistent state:
  *
  *   1. `delete(backup)`          — clear a stale backup
  *   2. `rename(path, backup)`    — old data survives as backup
  *   3. `rename(tmp, path)`       — publish (atomic per directory on
  *                                  HDFS-like filesystems)
  *   4. `delete(backup)`          — cleanup
  *
  * Crash matrix handled by [[Swap.recover]] (run it before reading or
  * deciding fresh-vs-merge):
  *   - `path` exists → swap completed or never started; drop stragglers.
  *   - only `backup` exists (± `tmp`) → died between 2 and 3; restore
  *     backup, drop the unpublished tmp (an uncommitted batch will be
  *     redelivered / a compaction can rerun).
  *   - neither exists, `tmp` present → first-ever publish died before 3;
  *     drop the partial tmp.
  */
object Swap {

  def backupOf(path: Path): Path = new Path(path.toString + "__backup")

  /** Restore a consistent `path` after a possible crash mid-swap.
    * Idempotent; cheap no-op (one `exists`) in the common case.
    */
  def recover(fs: FileSystem, path: Path, tmp: Path): Unit = {
    val backup = backupOf(path)
    if (fs.exists(path)) {
      fs.delete(backup, true)
      fs.delete(tmp, true)
    } else if (fs.exists(backup)) {
      if (!fs.rename(backup, path))
        throw new IOException(s"swap recovery failed: $backup -> $path")
      fs.delete(tmp, true)
    } else {
      fs.delete(tmp, true)
    }
  }

  /** Publish `tmp` (fully written) as `path`, preserving the old contents
    * as a recoverable backup until the new directory is live.
    */
  def publish(fs: FileSystem, path: Path, tmp: Path): Unit = {
    val backup = backupOf(path)
    fs.delete(backup, true)
    if (fs.exists(path) && !fs.rename(path, backup))
      throw new IOException(s"swap failed backing up: $path -> $backup")
    if (!fs.rename(tmp, path))
      throw new IOException(s"swap failed publishing: $tmp -> $path")
    fs.delete(backup, true)
  }
}
