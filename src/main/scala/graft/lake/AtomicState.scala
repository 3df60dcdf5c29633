package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets

/** Crash-safe single-file JSON state (catalog registry, checksum ledger,
  * audit log). Commit protocol: write the complete new content to
  * `<file>.tmp`, delete the old file, rename the tmp into place (local/HDFS
  * `rename` won't overwrite, hence the delete). The only crash window that
  * loses the main file is between delete and rename — and at that point the
  * `.tmp` is already complete, so reads recover by promoting it. Mirrors
  * SnapshotLog's recover-by-scan property for the ancillary state files.
  *
  * The read-path promotion means a reader in ANOTHER process can land
  * inside a writer's delete→rename window and promote the writer's own
  * completed tmp first, making the writer's rename fail even though its
  * state is committed. [[write]] therefore treats a failed rename as
  * success when the target already holds exactly the staged content.
  *
  * Concurrency contract: any number of readers, ONE writer per state
  * file at a time (the pipeline lock / scheduler serializes writers,
  * matching the reference's `lakehouse_scheduler.py` lock). Two
  * concurrent cross-process writers share the `.tmp` path and can
  * clobber each other's staging; the post-rename cleanup below guards
  * against deleting a foreign tmp, but simultaneous writes themselves
  * are last-writer-wins and unsupported.
  */
object AtomicState {

  private def tmpOf(target: Path) = new Path(target.getParent, target.getName + ".tmp")

  def write(fs: FileSystem, target: Path, content: String): Unit = {
    val tmp = tmpOf(target)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      // a concurrent reader may have promoted our completed tmp already
      // (see class doc); the commit succeeded iff the target now holds
      // the exact content we staged
      if (!readContent(fs, target).contains(content))
        throw new IllegalStateException(s"failed to commit $target")
      // best-effort cleanup (usually gone after promotion) — but only
      // when the leftover still holds OUR bytes: if another writer has
      // already staged a new tmp there, deleting it would destroy that
      // writer's in-flight commit (ADVICE r3)
      if (fs.exists(tmp) && readContent(fs, tmp).contains(content))
        fs.delete(tmp, false)
    }
  }

  /** Read the state file; when it is missing but a complete `.tmp` exists
    * (crash between delete and rename), promote the tmp and read that.
    */
  def read(fs: FileSystem, target: Path): Option[String] = {
    val tmp = tmpOf(target)
    if (!fs.exists(target) && fs.exists(tmp)) fs.rename(tmp, target)
    readContent(fs, target)
  }

  private def readContent(fs: FileSystem, target: Path): Option[String] =
    if (!fs.exists(target)) None
    else {
      val in = new InputStreamReader(fs.open(target), StandardCharsets.UTF_8)
      try {
        val sb = new StringBuilder
        val buf = new Array[Char](8192)
        var n = in.read(buf)
        while (n > 0) { sb.appendAll(buf, 0, n); n = in.read(buf) }
        Some(sb.toString)
      } finally in.close()
    }
}
