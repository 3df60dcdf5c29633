package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000L // 1 second in micros
  private val Bar = 60L * M // 1-minute bars

  // two series: "a" has a clean rise then dip; "b" is flat
  private def ticks = Seq(
    ("a", 0L * M, 10.0), ("a", 10L * M, 13.0), ("a", 50L * M, 9.0),
    ("a", 59L * M, 12.0), // bar 0: open 10 high 13 low 9 close 12
    ("a", 70L * M, 20.0), // bar 1: all 20
    ("b", 65L * M, 5.0)
  ).toDF("sym", "ts_us", "px")

  test("ohlcBars computes open/high/low/close/volume per (series, bar)") {
    val bars = TimeSeries.ohlcBars(ticks, "sym", "ts_us", "px", Bar)
      .orderBy("sym", "bar_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(bars.toSeq == Seq(
      ("a", 0L, 10.0, 13.0, 9.0, 12.0, 4L),
      ("a", 60L * M, 20.0, 20.0, 20.0, 20.0, 1L),
      ("b", 60L * M, 5.0, 5.0, 5.0, 5.0, 1L)))
  }

  test("ohlcBars open/close use timestamp order, not value order") {
    // a bar whose max value is neither first nor last
    val df = Seq(("x", 1L, 5.0), ("x", 2L, 99.0), ("x", 3L, 7.0))
      .toDF("sym", "ts_us", "px")
    val Row(open: Double, close: Double) =
      TimeSeries.ohlcBars(df, "sym", "ts_us", "px", Bar)
        .select("open", "close").head()
    assert(open == 5.0 && close == 7.0)
  }

  test("ohlcBars is a single shuffle (partial-agg, no window sort)") {
    val plan = TimeSeries.ohlcBars(ticks, "sym", "ts_us", "px", Bar)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected 1 shuffle, got:\n$plan")
  }

  test("volumeBars close when cumulative notional crosses the target") {
    // prices scaled 1e-4: target 50.0 → 500000 scaled
    val ticks = Seq(
      ("s", 1L, 30.0), ("s", 2L, 30.0), // bar 0: cum-before 0, 30 → closes past 50
      ("s", 3L, 10.0), ("s", 4L, 20.0), // bar 1: cum-before 60, 70
      ("s", 5L, 100.0) // bar 2 alone (cum-before 90 → bar 1? 90 div 50 = 1)
    ).toDF("sym", "ts_us", "px")
    val bars = TimeSeries.volumeBars(ticks, "sym", "ts_us", "px", 500000L)
      .orderBy("bar_id")
      .collect().map(r => (r.getLong(1), r.getLong(6), r.getDouble(7)))
    // (bar_id, n_ticks, notional): 90 div 50 = 1 keeps tick 5 in bar 1
    assert(bars.toSeq == Seq((0L, 2L, 60.0), (1L, 3L, 130.0)))
    // conservation: notional across bars equals total input notional
    assert(bars.map(_._3).sum == 190.0)
  }

  test("resampleLastKnown fills forward and leaves pre-first-tick grid null") {
    val filled = TimeSeries.resampleLastKnown(
        ticks, "sym", "ts_us", "px", stepMicros = Bar)
      .orderBy("sym", "grid_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // global grid: 0 and 60s (hi = 70s truncates to two grid points)
    assert(filled.toSeq == Seq(
      ("a", 0L, Some(10.0)), // tick AT the grid point matches (>= semantics)
      ("a", 60L * M, Some(12.0)), // last a-tick ≤ 60s is 59s @ 12.0
      ("b", 0L, None), // b's first tick is after the first grid point
      ("b", 60L * M, None) // ... and after 60s too (65s)
    ))
  }

  test("resampleLastKnown carries value through empty buckets") {
    val sparse = Seq(("s", 0L, 1.5), ("s", 10L * 60L * M, 2.5))
      .toDF("sym", "ts_us", "px")
    val filled = TimeSeries.resampleLastKnown(sparse, "sym", "ts_us", "px", Bar)
      .orderBy("grid_us").collect()
    assert(filled.length == 11)
    // minutes 0..9 hold 1.5, minute 10 flips to 2.5
    assert(filled.take(10).forall(_.getDouble(2) == 1.5))
    assert(filled.last.getDouble(2) == 2.5)
    // last_ts_us tracks the source tick of the carried value
    assert(filled(5).getLong(3) == 0L)
  }
}
