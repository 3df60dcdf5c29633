package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class EventAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed stats with watermark drop too-late rows and finalize windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventAggregates.windowedStats(
      input.toDF().toDF("ts", "event_type", "value"),
      windowLength = "10 minutes", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("winstats")
      .outputMode("append").start()

    // batch 1: two windows of data, watermark advances past window [0,10)
    input.addData((ts(1), "a", 1.0), (ts(5), "a", 2.0), (ts(12), "b", 3.0), (ts(35), "a", 4.0))
    q.processAllAvailable()
    // batch 2: a row for the already-finalized [0,10) window → dropped
    input.addData((ts(2), "a", 100.0), (ts(45), "b", 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("winstats")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // [0,10) was finalized with the original 2 rows; the late 100.0 never lands
    assert(rows.contains((ts(0), "a", 2L, 3.0)))
    assert(!rows.exists { case (w, t, _, s) => w == ts(0) && t == "a" && s > 3.0 })
    assert(rows.contains((ts(10), "b", 1L, 3.0)))
  }

  test("dedupWithinWatermark drops in-horizon duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val out = EventAggregates.dedupWithinWatermark(
      input.toDF().toDF("ts", "event_id", "value"),
      keyCols = Seq("event_id"), watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedupwm")
      .outputMode("append").start()

    // duplicate key 1 inside one batch and again in the next (still in
    // horizon) → emitted once; key 2 is distinct
    input.addData((ts(1), 1L, 1.0), (ts(2), 1L, 1.0), (ts(3), 2L, 2.0))
    q.processAllAvailable()
    input.addData((ts(4), 1L, 1.0), (ts(50), 3L, 3.0)) // dup + watermark push
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedupwm").select($"event_id").as[Long].collect().toSeq
    assert(ids.sorted === Seq(1L, 2L, 3L))
  }

  test("sessionize closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventAggregates.Event]
    val out = EventAggregates.sessionize(input.toDS(), gapMs = 5 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two bursts separated by > gap → first session closes when
    // the second burst arrives
    input.addData(
      EventAggregates.Event(1L, ts(0), 1.0),
      EventAggregates.Event(1L, ts(3), 2.0))
    q.processAllAvailable()
    input.addData(
      EventAggregates.Event(1L, ts(20), 3.0),
      EventAggregates.Event(2L, ts(21), 9.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions").as[EventAggregates.Session].collect()
    assert(sessions.length == 1) // only user 1's first burst has closed
    val s = sessions.head
    assert(s.user_id == 1L && s.n_events == 2L && s.sum_value == 3.0)
    assert(s.session_start == ts(0) && s.session_end == ts(3))
  }
}
