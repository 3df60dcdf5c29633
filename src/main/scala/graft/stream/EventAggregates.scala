package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming aggregation surface beyond the reference's file-watcher:
  * event-time windowed aggregates with watermarks (bounded state) and a
  * custom sessionization operator via flatMapGroupsWithState — the two
  * Structured Streaming patterns a tick/event pipeline needs that plain
  * `foreachBatch` ingest does not cover.
  *
  * (The reference's own dedup deliberately has NO watermark — see
  * WatcherStream. These operators are the engine's windowed-analytics
  * extension, where bounding state IS the correct semantics: state size
  * stays O(windows in the watermark horizon), not O(history), which is
  * what survives an unbounded stream on a real cluster.)
  */
object EventAggregates {

  /** Tumbling-window per-event-type counts/sums with a watermark.
    * Late rows beyond `watermarkDelay` are dropped and their windows
    * finalized — emitted exactly once in Append mode.
    */
  def windowedStats(
      events: DataFrame, // needs ts: timestamp, event_type: string, value: double
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Bounded-state streaming dedup: duplicates of a key arriving within
    * the watermark horizon are dropped; state is evicted once the
    * watermark passes, so memory is O(keys per horizon), not O(history).
    * The complement of the ingest pipeline's unbounded anti-join dedup
    * (WatcherStream T6): use THIS when the duplicate window is known to
    * be short (e.g. at-least-once upstream retries), the anti-join when
    * duplicates can arrive arbitrarily late (the reference's contract).
    */
  def dedupWithinWatermark(
      events: DataFrame, // needs an event-time column named by tsCol
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, nEvents: Long, sumValue: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization with explicit state: a user's session ends
    * after `gapMs` of event-time silence. The canonical
    * KeyValueGroupedDataset.flatMapGroupsWithState custom-state operator.
    *
    * `idleFlush = true` additionally arms a processing-time timeout so
    * users who never send another event still flush their last session —
    * the production setting. It keeps the query scheduling wake-up
    * micro-batches even with no input, so deterministic tests (and
    * drain-style runs) use the default `false`.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      idleFlush: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleFlush) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.nEvents + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                if (idleFlush) state.setTimeoutDuration(gapMs)
              case None => ()
            }
            closed.reverseIterator
          }
      }
  }
}
