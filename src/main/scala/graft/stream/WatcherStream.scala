package graft.stream

import graft.ingest.IngestPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's folder watcher
  * (`/root/reference/lakehouse_scheduler.py:34-58, 93-113`) re-expressed
  * as Structured Streaming: a parquet file source polled on a processing-
  * time trigger (default 30 s = `WATCH_INTERVAL_SECS`), feeding each
  * micro-batch through the ingest pipeline via `foreachBatch`.
  *
  * Semantics mapping (SURVEY.md §2.10):
  *  - T1 new-file detection     → file source + checkpoint ("seen files")
  *  - T3 exactly-once           → checkpoint (file level) + anti-join
  *                                dedup (row level, unbounded history)
  *  - T4 concurrency guard      → a single StreamingQuery serializes
  *                                micro-batches by construction
  *  - T6 late data              → deliberately NO watermark: the
  *                                reference accepts all late data and
  *                                dedups against the full table, so each
  *                                batch anti-joins table history instead
  *                                of using bounded dropDuplicates state
  *
  * NOTE the one semantic the file source cannot express: re-ingest of
  * MODIFIED files (the reference's mtime/checksum diff). Batch runs of
  * `IngestPipeline.run` with the checksum ledger cover that path
  * (SURVEY.md §7.5 item 6).
  */
object WatcherStream {

  /** Start watching `sourceDir` for new parquet files of `schema`,
    * ingesting each micro-batch into `gold.<symbol>`.
    */
  def start(
      spark: SparkSession,
      pipeline: IngestPipeline,
      sourceDir: String,
      symbol: String,
      schema: StructType,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(sourceDir)
      .writeStream
      .queryName(s"graft-watch-$symbol")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // empty triggers happen; skip the QC/append machinery for them
        if (!batch.isEmpty) {
          val res = pipeline.ingestBatch(symbol, batch)
          org.slf4j.LoggerFactory.getLogger(getClass)
            .info(s"batch $batchId: appended=${res.appended} rejected=${res.rejected} issues=${res.issues}")
        }
        ()
      }
      .start()
  }

  /** One-shot drain of everything currently in the folder (the testable
    * path, and the reference's `--now` mode analog for streams).
    */
  def drainOnce(
      spark: SparkSession,
      pipeline: IngestPipeline,
      sourceDir: String,
      symbol: String,
      schema: StructType,
      checkpointDir: String): Unit = {
    val q = start(spark, pipeline, sourceDir, symbol, schema, checkpointDir,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }
}
