package graft.stream

import graft.lake.LakehouseTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming sink into a [[LakehouseTable]] with exactly-once
  * batch commits — the `writeStream` counterpart of the batch ingest
  * path, and the engine's analog of Iceberg's streaming write.
  *
  * Spark's own guarantee for `foreachBatch` is AT-LEAST-once: after a
  * crash the restarted query re-delivers the batch that was in flight.
  * [[LakehouseTable.appendStream]] closes the gap by committing the
  * batch's files and the `(queryId, batchId)` watermark in one atomic
  * metadata commit — the replayed delivery finds its batchId already
  * recorded and no-ops, so the table sees each micro-batch exactly once
  * without any two-phase protocol between Spark's checkpoint and the
  * table. `queryId` must be stable across restarts (pass a logical name,
  * not the run-scoped UUID) and unique per destination table.
  */
object LakehouseSink {

  /** The foreachBatch function: plug into any `writeStream`. */
  def exactlyOnceAppend(table: LakehouseTable, queryId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => { table.appendStream(queryId, batchId, batch); () }

  /** Convenience wiring: micro-batch `df` into `table` with the
    * exactly-once sink and a processing-time trigger. The caller still
    * owns checkpointLocation choice (pass it in `options` upstream via
    * `df.writeStream` if needed) — this helper covers the common case.
    */
  def start(
      df: DataFrame,
      table: LakehouseTable,
      queryId: String,
      checkpointDir: String,
      triggerMs: Long = 500L): StreamingQuery =
    withSink(df.writeStream, table, queryId)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** Attach the sink to an existing writer (caller controls trigger,
    * checkpoint, and output-mode options).
    */
  def withSink(
      writer: DataStreamWriter[Row],
      table: LakehouseTable,
      queryId: String): DataStreamWriter[Row] =
    writer.foreachBatch(exactlyOnceAppend(table, queryId))
}
