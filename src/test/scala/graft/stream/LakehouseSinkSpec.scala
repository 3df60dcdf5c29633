package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** Exactly-once streaming writes: a live MemoryStream query lands every
  * micro-batch once; a replayed foreachBatch delivery (Spark's
  * at-least-once failure mode) is recognized by the committed watermark
  * and skipped; independent queries keep independent watermarks.
  */
class LakehouseSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d")

  private def fresh(name: String): LakehouseTable = {
    val schema = Seq((ts(0), 0.0)).toDF("DateTime", "Bid").schema
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("sink"), name), schema, Some("DateTime"))
  }

  test("streaming query lands each micro-batch exactly once") {
    val t = fresh("live")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val q = LakehouseSink
      .withSink(input.toDF().toDF("DateTime", "Bid").writeStream, t, "sink-live")
      .option("checkpointLocation", tmpDir("sink-ckpt"))
      .trigger(Trigger.ProcessingTime(50L))
      .start()
    try {
      input.addData((ts(0), 0.0), (ts(1), 1.0))
      q.processAllAvailable()
      input.addData((ts(2), 2.0))
      q.processAllAvailable()
    } finally q.stop()

    assert(t.read().count() == 3)
    assert(t.metadata.streamWatermarks.get("sink-live").exists(_ >= 1L))
    assert(t.snapshots.forall(_.operation != "append"),
      "streaming commits carry the stream-append operation")
  }

  test("a replayed batch is a no-op; the next batch commits") {
    val t = fresh("replay")
    val b0 = Seq((ts(0), 0.0), (ts(1), 1.0)).toDF("DateTime", "Bid")
    assert(t.appendStream("q1", 0L, b0).isDefined)
    val snaps = t.snapshots.size

    // crash-replay of batch 0: same data delivered again
    assert(t.appendStream("q1", 0L, b0).isEmpty, "replay must be skipped")
    assert(t.snapshots.size == snaps, "no snapshot for a replay")
    assert(t.read().count() == 2, "no duplicate rows")

    assert(t.appendStream("q1", 1L, Seq((ts(2), 2.0)).toDF("DateTime", "Bid")).isDefined)
    assert(t.read().count() == 3)
  }

  test("watermarks are per-query: a second writer is not blocked") {
    val t = fresh("multi")
    t.appendStream("qa", 5L, Seq((ts(0), 0.0)).toDF("DateTime", "Bid"))
    assert(t.appendStream("qb", 0L, Seq((ts(1), 1.0)).toDF("DateTime", "Bid")).isDefined,
      "qb's batch 0 is independent of qa's watermark")
    assert(t.read().count() == 2)
    assert(t.metadata.streamWatermarks == Map("qa" -> 5L, "qb" -> 0L))
  }

  test("an empty batch neither commits nor advances the watermark") {
    val t = fresh("empty")
    val empty = Seq.empty[(Timestamp, Double)].toDF("DateTime", "Bid")
    assert(t.appendStream("q", 0L, empty).isEmpty)
    assert(t.snapshots.isEmpty)
    assert(t.metadata.streamWatermarks.isEmpty)
  }
}
