package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Tick-series analytics over the lakehouse's native domain. The reference
  * is a tick-data ingestion lakehouse (SURVEY.md §1.1 — symbol/timestamp/
  * price rows, `lakehouse_pipeline.py`) whose only read query is the dedup
  * anti-join; these are the read-side operators its users run next, each
  * expressed as a declarative plan Catalyst can fully optimize.
  *
  * Scale shapes (the 100 TB argument, per operator):
  *   - [[ohlcBars]]: ONE hash aggregation keyed (series, bar). Open/close
  *     ride `min_by`/`max_by` — partial-aggregable, so the map side
  *     combines before the shuffle; bytes shuffled are O(#bars), not
  *     O(#ticks). No window, no sort.
  *   - [[resampleLastKnown]]: grid rows are O(series × buckets) — metadata-
  *     scale next to the tick table — and the fill is [[AsOfJoin.backward]],
  *     i.e. ONE sort-shuffle keyed by series, no range explosion.
  *
  * Determinism note (bench/oracle discipline): callers that need
  * cross-engine bit-equality should pass a tie-unique `tsCol` (testdata
  * `events.ts` is globally unique) so `min_by`/`max_by` have a total order.
  */
object TimeSeries {

  /** Exact SUM of a money-ish double as unscaled 1e-4 longs — same
    * order-independence + codegen argument as `Relational.decSumD`.
    */
  private def decSumD(c: Column): Column =
    (sum(round(c * 10000.0).cast(LongType)) / 10000.0).cast(org.apache.spark.sql.types.DoubleType)

  /** OHLCV bars: one row per (`seriesCol`, bar) where a bar is
    * `barMicros`-wide tumbling bucket of `tsCol` (epoch-micros column).
    * Emits open/high/low/close (raw input doubles, so bit-stable), tick
    * count, and the exact 1e-4-scaled notional sum of `priceCol`.
    */
  def ohlcBars(
      ticks: DataFrame,
      seriesCol: String,
      tsMicrosCol: String,
      priceCol: String,
      barMicros: Long): DataFrame = {
    val bar = (floor(col(tsMicrosCol) / barMicros) * barMicros).cast(LongType).as("bar_us")
    ticks
      .groupBy(col(seriesCol), bar)
      .agg(
        min_by(col(priceCol), col(tsMicrosCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(tsMicrosCol)).as("close"),
        count(lit(1)).as("n_ticks"),
        decSumD(col(priceCol)).as("notional"))
  }

  /** VOLUME BARS (equal-notional bars): bars close when cumulative
    * notional crosses `targetScaledNotional` (in 1e-4 price units) —
    * the activity-clocked alternative to time bars that samples busy
    * periods finely and quiet ones coarsely (standard in tick
    * microstructure work). Bar assignment is pure integer arithmetic
    * over an exact scaled cumulative sum (`(cum − v) div target`: a
    * tick opens a new bar when the notional BEFORE it has crossed the
    * target), so bar boundaries are engine-portable and
    * oracle-checkable. One sort-shuffle for the cumulative sum, one
    * hash aggregation for the bars — both keyed on the series.
    *
    * Emits per (series, bar_id): OHLC (timestamp-ordered), tick count,
    * exact notional, and the bar's time span.
    */
  def volumeBars(
      ticks: DataFrame,
      seriesCol: String,
      tsMicrosCol: String,
      priceCol: String,
      targetScaledNotional: Long): DataFrame = {
    require(targetScaledNotional > 0, "target notional must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(seriesCol).orderBy(tsMicrosCol)
    val withBar = ticks
      .withColumn("__v", round(col(priceCol) * 10000.0).cast(LongType))
      .withColumn("__cum", sum(col("__v")).over(w))
      // integral `div`, never double division: a cum/target quotient a
      // hair under an integer must truncate DOWN on both engines
      .withColumn("bar_id", expr(s"(__cum - __v) div ${targetScaledNotional}L"))
    withBar
      .groupBy(col(seriesCol), col("bar_id"))
      .agg(
        min_by(col(priceCol), col(tsMicrosCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(tsMicrosCol)).as("close"),
        count(lit(1)).as("n_ticks"),
        (sum(col("__v")) / 10000.0).cast(org.apache.spark.sql.types.DoubleType).as("notional"),
        min(col(tsMicrosCol)).as("bar_start_us"),
        max(col(tsMicrosCol)).as("bar_end_us"))
  }

  /** Regular-grid resample with last-known-value fill ("what was the last
    * tick at or before each grid point"). The grid spans
    * [hour-truncated global min ts, global max ts] in `stepMicros` steps,
    * crossed with the distinct series — both sides of that cross are
    * driver-metadata-scale (one aggregate row × #series), so the cross is
    * a broadcast nested loop over tiny inputs, never a tick-table blowup.
    * Grid points before a series' first tick keep null fill (left-outer
    * as-of semantics).
    *
    * Returns (`seriesCol`, grid_us, last_value, last_ts_us).
    */
  def resampleLastKnown(
      ticks: DataFrame,
      seriesCol: String,
      tsMicrosCol: String,
      valueCol: String,
      stepMicros: Long): DataFrame = {
    val bounds = ticks.agg(
      (floor(min(col(tsMicrosCol)) / stepMicros) * stepMicros).cast(LongType).as("lo"),
      max(col(tsMicrosCol)).as("hi"))
    val gridTimes = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(stepMicros))).as("grid_us"))
    val series = ticks.select(col(seriesCol)).distinct()
    val grid = gridTimes.crossJoin(series)

    val right = ticks.select(
      col(seriesCol),
      col(tsMicrosCol),
      col(valueCol).as("last_value"),
      col(tsMicrosCol).as("last_ts_us"))

    AsOfJoin.backward(
      grid, right,
      keys = Seq(seriesCol),
      leftTs = "grid_us",
      rightTs = tsMicrosCol,
      payloadCols = Seq("last_value", "last_ts_us"))
  }
}
