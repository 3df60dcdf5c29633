package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.Serialization

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** One committed version of a table: an ordered snapshot history plus the
  * schema/partition spec frozen at table creation.
  *
  * Equivalent of the Iceberg metadata the reference leans on
  * (`/root/reference/lakehouse_pipeline.py:373-394` creates tables with a
  * year partition spec and appends snapshots; `:232-270` lists/expires
  * them). Re-expressed as a minimal JSON log over any Hadoop FileSystem:
  * each commit writes `metadata/v{N}.json` then atomically swaps the
  * `metadata/VERSION` pointer (rename is atomic on HDFS and local FS; on
  * object stores an external lock/single-writer is required, which matches
  * the reference's scheduler lock, `lakehouse_scheduler.py:149`).
  */
/** One data file plus its column statistics for the partition-source
  * (time) column — the engine's analog of Iceberg's per-file manifest
  * stats. `minKeyUs`/`maxKeyUs` are epoch-micros bounds read from the
  * parquet footer at commit time; readers use them for metadata-level
  * FILE SKIPPING (e.g. dedup prunes existing files to those overlapping
  * the incoming batch's time range) — strictly finer than the
  * year-partition directory pruning, and evaluated before Spark ever
  * sees a path.
  */
final case class DataFile(
    path: String,
    rows: Long,
    minKeyUs: Option[Long],
    maxKeyUs: Option[Long]
) {
  def overlaps(loUs: Long, hiUs: Long): Boolean = (minKeyUs, maxKeyUs) match {
    case (Some(lo), Some(hi)) => hi >= loUs && lo <= hiUs
    case _ => true // no stats ⇒ cannot skip
  }
}

final case class Snapshot(
    id: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String,
    /** data files (relative to the table dir) that make up the table AT
      * this snapshot — a flat manifest; at 100 TB this list lives in
      * metadata, never in executor memory, and reads hand Spark the file
      * list directly so no directory listing of millions of files happens.
      */
    manifest: Seq[DataFile],
    addedFiles: Seq[DataFile],
    addedRows: Long,
    totalRows: Long
)

final case class TableMetadata(
    formatVersion: Int,
    name: String,
    schemaDdl: String,
    /** physical partition columns, e.g. Seq("DateTime_year") */
    partitionColumns: Seq[String],
    /** source column + transform that derives each partition column */
    partitionTransform: Option[String],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Option[Long]
) {
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.id == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.id == id)
}

object SnapshotLog {
  /** Leftover `v{N}.json` files younger than this are treated as a
    * possibly in-flight concurrent commit, not a crash leftover — see
    * [[SnapshotLog.commit]].
    */
  val DefaultStaleCommitThresholdMs: Long = 5 * 60 * 1000L
}

/** Atomic versioned metadata log under `<tableDir>/metadata/`. */
final class SnapshotLog(
    tableDir: Path,
    conf: Configuration,
    staleCommitThresholdMs: Long = SnapshotLog.DefaultStaleCommitThresholdMs) {
  private implicit val fmts: Formats = DefaultFormats
  private val metaDir = new Path(tableDir, "metadata")
  private def fs: FileSystem = tableDir.getFileSystem(conf)
  private def versionFile = new Path(metaDir, "VERSION")
  private def versionPath(v: Long) = new Path(metaDir, s"v$v.json")

  def exists: Boolean = fs.exists(versionFile)

  /** Reads the version pointer; if a writer crashed mid-swap (between
    * delete and rename — the swap is only atomic against readers on FS
    * with atomic rename-over), recovers by scanning for the max
    * committed v{N}.json, which is always correct because data files are
    * in place before any version file is written.
    */
  def currentVersion: Long =
    if (fs.exists(versionFile)) {
      val in = new BufferedReader(new InputStreamReader(fs.open(versionFile), StandardCharsets.UTF_8))
      try in.readLine().trim.toLong
      finally in.close()
    } else maxCommittedVersion.getOrElse(
      throw new IllegalStateException(s"no committed version under $metaDir"))

  private def maxCommittedVersion: Option[Long] = {
    val vs = fs.listStatus(metaDir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  def read(): TableMetadata = readVersion(currentVersion)

  def readVersion(v: Long): TableMetadata = {
    val in = fs.open(versionPath(v))
    try Serialization.read[TableMetadata](new InputStreamReader(in, StandardCharsets.UTF_8))
    finally in.close()
  }

  /** First commit (v0). Fails if the log already exists. */
  def create(meta: TableMetadata): Unit = {
    fs.mkdirs(metaDir)
    require(!exists, s"metadata log already exists at $metaDir")
    writeJson(versionPath(0), meta)
    swapPointer(0)
  }

  /** Optimistic-concurrency commit: read version v, write v+1, swap the
    * pointer. A concurrent committer loses by failing the create-new-file
    * check (HDFS/local create is atomic-exclusive).
    *
    * Crash recovery: a writer that died between writing `v{N+1}.json`
    * and swapping the pointer leaves an orphaned version file that no
    * pointer references; without reclaiming it, every future commit
    * would fail the exists-check forever. But a LIVE concurrent
    * committer is in the same observable state — it writes
    * `v{N+1}.json` first and swaps the pointer last — so
    * "file exists, pointer unmoved" is ambiguous between crash
    * leftover and in-flight commit. The leftover is only reclaimed
    * when it is older than `staleCommitThresholdMs` (no writer holds a
    * commit open that long); a fresh leftover raises instead of
    * silently deleting an in-flight writer's file, which would let
    * both swaps "succeed" and lose one snapshot. A concurrent commit
    * that already swapped the pointer is caught by the
    * `currentVersion != expectedVersion` check.
    */
  def commit(expectedVersion: Long, meta: TableMetadata): Long = {
    val next = expectedVersion + 1
    val p = versionPath(next)
    if (fs.exists(p)) {
      require(currentVersion == expectedVersion,
        s"concurrent commit detected: $p exists and the version pointer moved " +
          s"(expected v$expectedVersion, found v$currentVersion)")
      val ageMs = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
      require(ageMs >= staleCommitThresholdMs,
        s"possible in-flight concurrent commit: $p is ${ageMs}ms old " +
          s"(threshold ${staleCommitThresholdMs}ms); retry once the other " +
          "writer finishes, or reclaim via a SnapshotLog with a lower threshold")
      fs.delete(p, false) // stale crash leftover: unreferenced by any pointer
    }
    writeJson(p, meta)
    swapPointer(next)
    next
  }

  private def writeJson(p: Path, meta: TableMetadata): Unit = {
    val out = fs.create(p, false)
    try out.write(Serialization.writePretty(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def swapPointer(v: Long): Unit = {
    val tmp = new Path(metaDir, s"VERSION.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(versionFile, false) // rename-over is not portable across FS impls
    if (!fs.rename(tmp, versionFile))
      throw new IllegalStateException(s"failed to swap version pointer to v$v")
  }
}
