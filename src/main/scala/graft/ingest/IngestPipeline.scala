package graft.ingest

import graft.lake.{LakehouseCatalog, LakehouseTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.storage.StorageLevel

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** The reference's `run_pipeline`
  * (`/root/reference/lakehouse_pipeline.py:289-424`) re-expressed
  * Spark-first: per symbol-folder, discover parquet files, checksum-skip
  * unchanged ones, then per file scan → normalize → quality-check →
  * dedup-against-table → snapshot append, followed by snapshot expiry per
  * table and a run audit entry.
  *
  * Cluster boundaries: the scan/normalize/QC/dedup/append steps are Spark
  * jobs (executor-parallel); catalog, ledger, and audit are tiny
  * driver-side JSON state, exactly mirroring the reference's split
  * (SURVEY.md §3).
  */
final case class IngestConfig(
    warehouseDir: String,
    namespace: String = "gold",
    timeColumn: String = "DateTime",
    requiredColumns: Seq[String] = Seq("DateTime", "Bid", "Ask"),
    positiveColumns: Seq[String] = Seq("Bid", "Ask"),
    minRows: Long = 100L,
    maxNullFraction: Double = 0.05,
    retentionDays: Int = 7,
    keepSnapshots: Int = 2,
    /** >1 ingests independent symbols (= independent tables) from that
      * many driver threads concurrently — each table has its own
      * snapshot log so commits don't contend; catalog and ledger
      * mutations are internally synchronized. 1 = the reference's
      * strictly sequential behavior.
      */
    symbolParallelism: Int = 1,
    /** Batched per-symbol ingest: union all new files into ONE scan with
      * per-file QC in a single grouped pass, one dedup, one append —
      * instead of a full Spark job pipeline per file. At millions of
      * small files the per-file driver loop is the ingest bottleneck
      * (VERDICT r3 "What's wrong" #3); batched mode makes the driver
      * cost O(1) jobs per symbol while keeping per-file accounting via
      * input_file_name(). false = the reference's file-at-a-time flow.
      */
    batchedIngest: Boolean = false,
    /** Partition granularity of created tables (year | month | day |
      * hour | identity — see LakehouseTable.Granularities). The
      * reference hardcodes year; 100 TB tick data wants day/hour.
      */
    partitionGranularity: String = "year",
    /** What an incoming row with an already-ingested time key means:
      *  - "drop"  (reference semantics): first write wins — the anti-join
      *    discards it. NOTE this makes the reference's modified-file
      *    re-ingest a no-op for changed VALUES: the checksum ledger
      *    re-reads the file but every key already exists.
      *  - "upsert": last write wins — a copy-on-write merge replaces the
      *    existing rows (file-surgical, see LakehouseTable.merge).
      *  - "mor-upsert": last write wins via merge-on-read — one commit
      *    of batch + equality-delete key mask, ZERO existing files
      *    rewritten (LakehouseTable.morMerge). The CDC shape when
      *    updates are frequent and small relative to the table; reads
      *    pay a broadcast anti-join until maintenance folds the masks.
      */
    duplicateKeyPolicy: String = "drop"
)

final case class FileIngestResult(
    file: String,
    appended: Long,
    rejected: Long,
    skipped: Boolean,
    issues: Seq[String]
)

final class IngestPipeline(spark: SparkSession, cfg: IngestConfig) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  val catalog = new LakehouseCatalog(spark, cfg.warehouseDir)
  private val whPath = new Path(cfg.warehouseDir)
  private def fs = whPath.getFileSystem(spark.sessionState.newHadoopConf())
  private val ledger = new ChecksumLedger(new Path(whPath, "ingested_files.json"), fs)
  private val audit = new AuditLog(new Path(whPath, "audit_log.json"), fs)
  private val runIdFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)
  /** T4 concurrency guard (reference `lakehouse_scheduler.py:149`): the
    * watcher and the daily scheduler share one pipeline instance; runs
    * and micro-batches must never interleave (single-writer keeps the
    * metadata commit protocol trivially correct).
    */
  private val pipelineLock = new Object

  catalog.createNamespaceIfNotExists(cfg.namespace)

  /** Full run over a data root whose first-level subdirectories are
    * symbols (reference `:322-331`), each holding parquet files at any
    * depth (`:343`).
    */
  def run(dataRoot: String): RunSummary = pipelineLock.synchronized {
    val t0 = Instant.now()
    val root = new Path(dataRoot)
    val symbols = fs.listStatus(root).filter(_.isDirectory).map(_.getPath).sortBy(_.getName).toSeq
    // persist the ledger ONCE at run end (below), not per symbol: each
    // persist rewrites the whole map, so per-symbol persists cost
    // O(symbols × ledger) per run. A crash before the end-of-run persist
    // only costs re-examining this run's files next time — checksum-skip
    // plus row-level dedup make that re-work a no-op.
    def one(symDir: Path): TableAudit =
      ingestSymbolInner(symDir.getName, listParquet(symDir), persistLedger = false)
    val tableAudits =
      if (cfg.symbolParallelism <= 1 || symbols.size <= 1) symbols.map(one)
      else {
        // symbols are independent tables: fan the per-symbol loops over a
        // fixed driver-thread pool (Spark schedules jobs from many
        // threads fine); audit order stays deterministic
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.symbolParallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(symbols.map(sd => Future(one(sd)))), Duration.Inf)
        finally pool.shutdown()
      }
    ledger.persist()
    val t1 = Instant.now()
    val summary = RunSummary(
      runId = runIdFmt.format(t0),
      startedAtIso = t0.toString,
      finishedAtIso = t1.toString,
      durationSecs = (t1.toEpochMilli - t0.toEpochMilli) / 1000.0,
      tables = tableAudits,
      totalRowsAppended = tableAudits.map(_.rowsAppended).sum,
      errors = Nil)
    audit.append(summary)
    summary
  }

  private def listParquet(dir: Path): Seq[Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) out += st.getPath
    }
    out.sortBy(_.toString).toSeq
  }

  /** Ingest a set of files into one symbol's table, then expire old
    * snapshots for that table (reference `:328-405`). File-at-a-time or
    * union-batched per cfg.batchedIngest; audit totals are identical
    * (per-file attribution of cross-file duplicate keys may differ —
    * sequential awards the earliest file, batched an arbitrary one).
    */
  def ingestSymbol(symbol: String, files: Seq[Path]): TableAudit =
    ingestSymbolInner(symbol, files, persistLedger = true)

  private def ingestSymbolInner(
      symbol: String, files: Seq[Path], persistLedger: Boolean): TableAudit = {
    val results =
      if (cfg.batchedIngest) ingestFilesBatched(symbol, files)
      else files.map(f => ingestFile(symbol, f))
    if (persistLedger) ledger.persist()
    val tableId = s"${cfg.namespace}.${symbol.toLowerCase}"
    if (catalog.tableExists(tableId)) {
      val (expired, orphans) = catalog.loadTable(tableId).expireSnapshots(
        retentionMs = cfg.retentionDays.toLong * 24 * 3600 * 1000,
        keepLast = cfg.keepSnapshots)
      if (expired.nonEmpty)
        log.info(s"expired snapshots $expired of $tableId, deleted ${orphans.size} files")
    }
    TableAudit(
      table = tableId,
      rowsAppended = results.map(_.appended).sum,
      rowsRejected = results.map(_.rejected).sum,
      filesProcessed = results.count(r => !r.skipped),
      filesSkipped = results.count(_.skipped),
      qualityIssues = results.flatMap(_.issues))
  }

  /** Per-file flow (reference `:352-399`): checksum-skip → scan →
    * normalize → QC (fail ⇒ reject all rows) → table create-if-missing
    * (schema frozen from this first batch) → dedup anti-join → append
    * only when new rows exist.
    */
  def ingestFile(symbol: String, file: Path): FileIngestResult = {
    val sum = ledger.checksum(file)
    if (ledger.isUnchanged(file, sum))
      return FileIngestResult(file.toString, 0, 0, skipped = true, Nil)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(file.toString)
    // cache the normalized batch once: QC, dedup, and the append all
    // re-read it — without this the file is scanned 3-4 times per ingest
    val df = Normalize(raw, cfg.timeColumn).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val qc = QualityChecks.run(df, QcConfig(
        cfg.requiredColumns, cfg.timeColumn, cfg.positiveColumns,
        cfg.minRows, cfg.maxNullFraction))
      if (!qc.passed)
        return FileIngestResult(file.toString, 0, math.max(qc.nRows, 0), skipped = false, qc.issues)

      val tableId = s"${cfg.namespace}.${symbol.toLowerCase}"
      val table = catalog.createTableIfNotExists(
        tableId, df.schema, Some(cfg.timeColumn), cfg.partitionGranularity)

      // reject null-time-key rows (within QC's 5% tolerance they pass QC):
      // an equi-anti-join can never dedup them (null != null), so each
      // re-ingest would append them again, breaking the no-duplicate-key
      // invariant (ADVICE r1)
      val keyed =
        if (qc.nullTimeKey > 0) df.filter(col(cfg.timeColumn).isNotNull)
        else df
      val issues =
        if (qc.nullTimeKey > 0) Seq(s"Rejected ${qc.nullTimeKey} rows with null ${cfg.timeColumn}")
        else Nil

      // within-batch dedup FIRST: the reference skips this (its tick
      // files have unique timestamps by construction), but appending a
      // batch with internal key duplicates would break the engine's
      // no-duplicate-key table invariant — a deliberate, documented
      // divergence (SURVEY §2.3)
      // the staged write IS the emptiness check — no pre-append count()
      // materialization of the anti-join, and an all-duplicate re-ingest
      // commits no snapshot (reference `:388-392`)
      val nNew = writeBatch(table, keyed)
      ledger.record(file, sum)
      FileIngestResult(file.toString, nNew, qc.nullTimeKey, skipped = false, issues)
    } finally df.unpersist()
  }

  /** Land a normalized, null-key-free batch per duplicateKeyPolicy:
    * "drop" anti-joins table history and appends only new keys;
    * "upsert" merges (existing keys replaced file-surgically). Returns
    * the batch's own contribution — inserts plus updates under upsert,
    * fresh keys under drop (0 = nothing committed); rewritten survivor
    * rows are not counted.
    */
  private def writeBatch(table: LakehouseTable, keyed: DataFrame): Long = {
    val deduped = Dedup.withinBatch(keyed, Seq(cfg.timeColumn))
    cfg.duplicateKeyPolicy match {
      case "upsert" | "mor-upsert" =>
        // report the batch's OWN contribution, not merge's addedRows —
        // the rewritten files also carry untouched survivor rows, which
        // would inflate per-file counts relative to the drop policy and
        // the reference's accounting (ADVICE r2). deduped derives from
        // the cached `df`, so the count is a cheap second pass.
        val n = deduped.count()
        if (n > 0) {
          if (cfg.duplicateKeyPolicy == "mor-upsert") table.morMerge(deduped, cfg.timeColumn)
          else table.merge(deduped, cfg.timeColumn)
        }
        n
      case _ =>
        val fresh = Dedup.dropExisting(deduped, table, cfg.timeColumn)
        table.appendIfNonEmpty(fresh).map(_.addedRows).getOrElse(0L)
    }
  }

  /** The batched scale path (cfg.batchedIngest): checksum-skip on the
    * driver as usual, then ingest ALL fresh files of the symbol through
    * one union scan — per-file QC via a single grouped aggregation on
    * `input_file_name()`, one within-batch dedup, one anti-join/merge,
    * ONE snapshot commit — so driver work per symbol is a constant
    * number of Spark jobs instead of ~4 jobs × |files|. Per-file
    * appended/rejected counts are recovered from the same
    * `input_file_name()` column, preserving the reference's audit
    * granularity (`lakehouse_pipeline.py:352-399`).
    */
  private def ingestFilesBatched(symbol: String, files: Seq[Path]): Seq[FileIngestResult] = {
    // bounded-parallel: MD5 is a full-file read per entry; serially this
    // is the exact per-file driver loop batched mode exists to collapse
    val sums = graft.util.BoundedPar.map(files)(f => f -> ledger.checksum(f))
    val (unchanged, fresh) = sums.partition { case (f, s) => ledger.isUnchanged(f, s) }
    val skippedResults = unchanged.map { case (f, _) =>
      FileIngestResult(f.toString, 0, 0, skipped = true, Nil) }
    if (fresh.isEmpty) return skippedResults

    // Q2 is schema-level, and a union scan resolves ONE merged schema: a
    // file individually missing a required column would be silently
    // null-filled under it — passing batched QC where the per-file loop
    // rejects the file (ADVICE r4). Check each file's OWN parquet footer
    // (footer-only read, no data pages) and exclude offenders from the
    // union so both modes reject identically.
    val hconf = spark.sessionState.newHadoopConf()
    def footerColumns(f: Path): Set[String] = {
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf))
      try {
        import scala.jdk.CollectionConverters._
        in.getFooter.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
      } finally in.close()
    }
    // footer-only opens, bounded-parallel for the same reason as the
    // checksums above (no data pages are read either way)
    val colsByFile =
      graft.util.BoundedPar.map(fresh) { case (f, _) => f -> footerColumns(f) }.toMap
    val (schemaOk, schemaBad) = fresh.partition { case (f, _) =>
      cfg.requiredColumns.forall(colsByFile(f).contains) }
    val badResults = schemaBad.map { case (f, _) =>
      val missing = cfg.requiredColumns.filterNot(colsByFile(f).contains)
      FileIngestResult(f.toString, 0, 0, skipped = false,
        Seq(s"Missing required columns: ${missing.mkString(", ")}")) }
    if (schemaOk.isEmpty) return skippedResults ++ badResults

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(schemaOk.map(_._1.toString): _*)
      .withColumn("__src", input_file_name())
    val df = Normalize(raw, cfg.timeColumn).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val qcBySrc = QualityChecks.runPerFile(df, "__src", QcConfig(
        cfg.requiredColumns, cfg.timeColumn, cfg.positiveColumns,
        cfg.minRows, cfg.maxNullFraction))
      // input_file_name() yields URIs; match them back to ledger paths
      def norm(s: String): String = new Path(new java.net.URI(s)).toUri.getPath
      val qcByPath = qcBySrc.map { case (src, qc) => norm(src) -> (src, qc) }
      def qcOf(f: Path): Option[(String, QcResult)] =
        qcByPath.get(fs.makeQualified(f).toUri.getPath)

      val passSrcs = schemaOk.flatMap(p => qcOf(p._1)).collect { case (src, qc) if qc.passed => src }
      val appendedByPath: Map[String, Long] =
        if (passSrcs.isEmpty) Map.empty
        else {
          val passing = df.filter(col("__src").isin(passSrcs: _*))
          // same null-time-key rejection as ingestFile (see comment there)
          val keyed = passing.filter(col(cfg.timeColumn).isNotNull)
          val tableId = s"${cfg.namespace}.${symbol.toLowerCase}"
          val table = catalog.createTableIfNotExists(
            tableId, keyed.drop("__src").schema, Some(cfg.timeColumn),
            cfg.partitionGranularity)
          val deduped = Dedup.withinBatch(keyed, Seq(cfg.timeColumn))
          val toWrite = cfg.duplicateKeyPolicy match {
            case "upsert" | "mor-upsert" => deduped
            case _ => Dedup.dropExisting(deduped, table, cfg.timeColumn)
          }
          // one cheap grouped count (inputs cached) recovers the
          // per-file contribution the sequential loop reported
          val counts = toWrite.groupBy("__src").count().collect()
            .map(r => norm(r.getString(0)) -> r.getLong(1)).toMap
          if (counts.values.sum > 0) {
            val batch = toWrite.drop("__src")
            cfg.duplicateKeyPolicy match {
              case "mor-upsert" => table.morMerge(batch, cfg.timeColumn)
              case "upsert" => table.merge(batch, cfg.timeColumn)
              case _ => table.append(batch)
            }
          }
          counts
        }

      skippedResults ++ badResults ++ schemaOk.map { case (f, sum) =>
        qcOf(f) match {
          case Some((_, qc)) if qc.passed =>
            ledger.record(f, sum)
            val issues =
              if (qc.nullTimeKey > 0)
                Seq(s"Rejected ${qc.nullTimeKey} rows with null ${cfg.timeColumn}")
              else Nil
            FileIngestResult(f.toString,
              appendedByPath.getOrElse(fs.makeQualified(f).toUri.getPath, 0L),
              qc.nullTimeKey, skipped = false, issues)
          case Some((_, qc)) =>
            FileIngestResult(f.toString, 0, math.max(qc.nRows, 0), skipped = false, qc.issues)
          case None => // zero-row parquet: no input_file_name group emitted
            FileIngestResult(f.toString, 0, 0, skipped = false,
              Seq(s"Insufficient rows: 0 < ${cfg.minRows}"))
        }
      }
    } finally df.unpersist()
  }

  /** Micro-batch entry used by the streaming watcher: ingest an already
    * loaded DataFrame into a symbol's table (normalize → QC → dedup →
    * append), bypassing the file ledger (the stream source's checkpoint
    * provides file-level exactly-once).
    */
  def ingestBatch(symbol: String, batch: DataFrame): FileIngestResult = pipelineLock.synchronized {
    val df = Normalize(batch, cfg.timeColumn).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val qc = QualityChecks.run(df, QcConfig(
        cfg.requiredColumns, cfg.timeColumn, cfg.positiveColumns,
        cfg.minRows, cfg.maxNullFraction))
      if (!qc.passed)
        return FileIngestResult(s"batch:$symbol", 0, math.max(qc.nRows, 0), skipped = false, qc.issues)
      val tableId = s"${cfg.namespace}.${symbol.toLowerCase}"
      val table = catalog.createTableIfNotExists(
        tableId, df.schema, Some(cfg.timeColumn), cfg.partitionGranularity)
      // same null-time-key rejection as ingestFile (see comment there)
      val keyed =
        if (qc.nullTimeKey > 0) df.filter(col(cfg.timeColumn).isNotNull)
        else df
      val issues =
        if (qc.nullTimeKey > 0) Seq(s"Rejected ${qc.nullTimeKey} rows with null ${cfg.timeColumn}")
        else Nil
      val n = writeBatch(table, keyed)
      FileIngestResult(s"batch:$symbol", n, qc.nullTimeKey, skipped = false, issues)
    } finally df.unpersist()
  }

  /** Record checksums of files a STREAM already delivered: the file
    * source's checkpoint guarantees it never re-reads them, so without a
    * ledger entry a later in-place modification would be invisible to
    * everyone. With the entry, [[reingestModified]] can detect the byte
    * change and route the file through the duplicateKeyPolicy path.
    */
  def recordStreamed(files: Seq[Path]): Unit = {
    files.foreach(f => ledger.record(f, ledger.checksum(f)))
    ledger.persist()
  }

  /** Modified-file re-ingest for the streaming path (reference
    * mtime-diff, `lakehouse_scheduler.py:47-58`): re-examine
    * ledger-known files under `dataRoot` and push any whose bytes
    * changed back through [[ingestFile]] (checksum-skip makes unchanged
    * files a cheap no-op; changed files land per duplicateKeyPolicy —
    * "upsert" replaces the old rows, "drop" keeps first-write-wins).
    * Files the ledger does NOT know are left to the stream source —
    * re-ingesting them here would race the next micro-batch.
    *
    * `modifiedSinceMs` is the reference's mtime pre-filter: only files
    * touched at or after it are re-checksummed, so a steady-state sweep
    * costs one directory listing, not one checksum per known file.
    */
  def reingestModified(dataRoot: String, modifiedSinceMs: Long = 0L): Seq[FileIngestResult] =
    pipelineLock.synchronized {
      val root = new Path(dataRoot)
      if (!fs.exists(root)) return Nil
      val symbols = fs.listStatus(root).filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
      val results = symbols.toSeq.flatMap { symDir =>
        listParquet(symDir)
          .filter(f => ledger.isKnown(f) &&
            fs.getFileStatus(f).getModificationTime >= modifiedSinceMs)
          .map(f => ingestFile(symDir.getName, f))
          .filterNot(_.skipped)
      }
      if (results.nonEmpty) ledger.persist()
      results
    }

  def auditLog: AuditLog = audit
}
