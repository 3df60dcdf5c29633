package graft.stream

import graft.ingest.{IngestPipeline, RunSummary}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's `mode_all` composition
  * (`/root/reference/lakehouse_scheduler.py:138-188`): the folder
  * watcher and the 02:00 UTC daily batch run operate concurrently over
  * ONE shared IngestPipeline. The reference serializes the two threads
  * with an explicit `threading.Lock`; here the pipeline's internal lock
  * does the same — `ingestBatch` (every watcher micro-batch slice),
  * `run` (the scheduled full sweep), and `reingestModified` all enter
  * `pipelineLock.synchronized`, so a micro-batch can never interleave
  * with a scheduled run's commits.
  *
  * Overlap between the two paths is safe by design: a file the watcher
  * already streamed is checksum-recorded, so the daily run's ledger
  * check skips it; a file the daily run ingested first gets its rows
  * anti-joined away when the watcher's micro-batch lands (row-level
  * exactly-once on top of two independent file-level trackers).
  */
final class GraftScheduler(
    spark: SparkSession,
    pipeline: IngestPipeline,
    dataRoot: String,
    schema: StructType,
    checkpointDir: String,
    daily: DailyScheduler = new DailyScheduler()) {

  @volatile private var query: Option[StreamingQuery] = None
  @volatile private var dailyThread: Option[Thread] = None

  /** Start watcher + daily scheduler (reference `mode_all`). Returns the
    * watcher query; the scheduler runs on a daemon thread until
    * [[stop]].
    */
  def start(
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      pollSeconds: Int = 60): StreamingQuery = {
    require(query.isEmpty, "scheduler already started")
    val q = WatcherStream.startRoot(spark, pipeline, dataRoot, schema, checkpointDir, trigger)
    query = Some(q)
    val t = new Thread(() => daily.loop(pollSeconds) { () => pipeline.run(dataRoot); () },
      "graft-daily-scheduler")
    t.setDaemon(true)
    t.start()
    dailyThread = Some(t)
    q
  }

  /** The reference's `--now` flag: one immediate full batch run through
    * the shared pipeline lock (blocks until any in-flight micro-batch
    * commit completes, exactly like the reference's lock acquisition).
    */
  def runNow(): RunSummary = {
    val summary = pipeline.run(dataRoot)
    daily.markRan() // the scheduled slot shouldn't double-fire right after
    summary
  }

  def stop(): Unit = {
    dailyThread.foreach(_.interrupt())
    dailyThread = None
    query.foreach(_.stop())
    query = None
  }
}
