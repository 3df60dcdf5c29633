package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.Serialization

/** Run audit trail — the reference's `audit_log.json` array of run
  * summaries (`/root/reference/lakehouse_pipeline.py:70, 97-107,
  * 289-297, 407-417`): run id, per-table append/reject counts, files
  * processed/skipped, quality issues, and wall time. Read-modify-write
  * of a small JSON array on the driver, exactly like the reference.
  */
final case class TableAudit(
    table: String,
    rowsAppended: Long,
    rowsRejected: Long,
    filesProcessed: Int,
    filesSkipped: Int,
    qualityIssues: Seq[String]
)

final case class RunSummary(
    runId: String,
    startedAtIso: String,
    finishedAtIso: String,
    durationSecs: Double,
    tables: Seq[TableAudit],
    totalRowsAppended: Long,
    errors: Seq[String]
)

final class AuditLog(auditFile: Path, fs: FileSystem) {
  private implicit val fmts: Formats = DefaultFormats

  def readAll(): Seq[RunSummary] =
    graft.lake.AtomicState.read(fs, auditFile)
      .map(Serialization.read[Seq[RunSummary]])
      .getOrElse(Nil)

  def append(run: RunSummary): Unit =
    graft.lake.AtomicState.write(
      fs, auditFile, Serialization.writePretty(readAll() :+ run))
}
