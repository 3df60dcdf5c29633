package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.Serialization

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets
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
    if (!fs.exists(ledgerFile)) Map.empty
    else {
      val in = fs.open(ledgerFile)
      try Serialization.read[Map[String, String]](new InputStreamReader(in, StandardCharsets.UTF_8))
      finally in.close()
    }

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
  def isUnchanged(file: Path, sum: String): Boolean =
    entries.get(file.toString).contains(sum)

  def record(file: Path, sum: String): Unit =
    entries += (file.toString -> sum)

  def persist(): Unit = {
    val tmp = new Path(ledgerFile.getParent, ledgerFile.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(Serialization.writePretty(entries).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(ledgerFile, false)
    if (!fs.rename(tmp, ledgerFile))
      throw new IllegalStateException(s"failed to persist ledger $ledgerFile")
  }

  def size: Int = entries.size
}
