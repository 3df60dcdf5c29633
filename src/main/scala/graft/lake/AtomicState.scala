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
  */
object AtomicState {

  private def tmpOf(target: Path) = new Path(target.getParent, target.getName + ".tmp")

  def write(fs: FileSystem, target: Path, content: String): Unit = {
    val tmp = tmpOf(target)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"failed to commit $target")
  }

  /** Read the state file; when it is missing but a complete `.tmp` exists
    * (crash between delete and rename), promote the tmp and read that.
    */
  def read(fs: FileSystem, target: Path): Option[String] = {
    val tmp = tmpOf(target)
    if (!fs.exists(target) && fs.exists(tmp)) fs.rename(tmp, target)
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
}
