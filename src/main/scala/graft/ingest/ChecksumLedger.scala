package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.Serialization

import java.security.MessageDigest

/** Exactly-once file ingestion ledger — the reference's
  * `{file_path: md5}` map (`/root/reference/lakehouse_pipeline.py:71,
  * 110-128, 352-357`): a file is skipped when its checksum is unchanged
  * and re-ingested when the bytes changed (which Spark's streaming file
  * source alone can't express — it ignores modified files; SURVEY.md
  * §7.5 item 6). Checksums stream in 8 KiB chunks like the reference
  * (`:126`). Driver-side state: the ledger is tiny (one entry per file).
  */
final class ChecksumLedger(ledgerFile: Path, fs: FileSystem) {
  private implicit val fmts: Formats = DefaultFormats
  private var entries: Map[String, String] = load()

  private def load(): Map[String, String] =
    graft.lake.AtomicState.read(fs, ledgerFile)
      .map(Serialization.read[Map[String, String]])
      .getOrElse(Map.empty)

  def checksum(file: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = fs.open(file)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** True when the file's current bytes were already ingested. */
  def isUnchanged(file: Path, sum: String): Boolean = synchronized {
    entries.get(file.toString).contains(sum)
  }

  /** True when the ledger has ANY entry for the file (regardless of
    * whether the bytes changed since) — the modified-file sweep uses
    * this to restrict itself to files already processed once.
    */
  def isKnown(file: Path): Boolean = synchronized {
    entries.contains(file.toString)
  }

  def record(file: Path, sum: String): Unit = synchronized {
    entries += (file.toString -> sum)
  }

  def persist(): Unit = synchronized {
    graft.lake.AtomicState.write(fs, ledgerFile, Serialization.writePretty(entries))
  }

  def size: Int = synchronized(entries.size)
}
