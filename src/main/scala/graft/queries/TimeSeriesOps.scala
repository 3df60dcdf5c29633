package graft.queries

import graft.Tables.t
import graft.ops.TimeSeries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tick-series read queries over the reference's own domain (symbol /
  * timestamp / price — SURVEY.md §1.1): OHLCV bars, VWAP, moving bands,
  * grid resampling with last-known fill, and daily returns + trailing
  * volatility. The reference ingests tick data but ships no read-side
  * analytics beyond the dedup anti-join; this is the query surface its
  * users run on the tables it builds, kept first-class (oracle-checked,
  * one-shuffle shapes — see [[graft.ops.TimeSeries]] scaladoc).
  *
  * Cross-engine determinism: every derived double here is produced only
  * by IEEE-exact operations (integer-scaled sums, subtraction, division,
  * sqrt — all correctly rounded per IEEE 754 and therefore bit-identical
  * on Spark and DuckDB) with both engines given literally the same
  * operation order. No libm transcendentals (no ln/exp/pow on data).
  */
object TimeSeriesOps {

  private val HourUs = 3600L * 1000000L
  private val DayUs = 24L * HourUs

  // unscaled-long exact sum — see Relational.decSumD for the argument
  private def decSumD(c: Column): Column =
    (sum(round(c * 10000.0).cast(LongType)) / 10000.0).cast(DoubleType)

  private def evMicros(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_type"), unix_micros(col("ts")).as("ts_us"),
      col("value"), col("event_id"))

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_ts_ohlc_bars",
      (s, dir) =>
        TimeSeries.ohlcBars(
            evMicros(s, dir),
            seriesCol = "event_type", tsMicrosCol = "ts_us",
            priceCol = "value", barMicros = DayUs)
          .orderBy("event_type", "bar_us"),
      // open/close via arg_min/arg_max on the globally-unique ts; o/h/l/c
      // are raw parquet doubles (bit-stable), notional is the decimal twin
      Some("""SELECT event_type,
             |       (epoch_us(ts) // 86400000000) * 86400000000 AS bar_us,
             |       arg_min("value", ts) AS "open",
             |       max("value") AS high,
             |       min("value") AS low,
             |       arg_max("value", ts) AS "close",
             |       count(*) AS n_ticks,
             |       CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS notional
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_ts_vwap",
      (s, dir) => {
        // volume-weighted average price per (returnflag, ship-month):
        // vwap = exact Σ extendedprice / exact Σ quantity — one division
        // of two exactly-reproducible doubles, IEEE-deterministic
        val li = t(s, dir, "lineitem")
        li.groupBy(
            col("l_returnflag"),
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
              .cast(LongType).as("ship_month"))
          .agg(
            decSumD(col("l_extendedprice")).as("sum_price"),
            sum(col("l_quantity")).cast(LongType).as("sum_qty"),
            count(lit(1)).as("n_lines"))
          .withColumn("vwap",
            round(col("sum_price") / col("sum_qty").cast(DoubleType), 4))
          .orderBy("l_returnflag", "ship_month")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_month,
             |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |         count(*) AS n_lines
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, ship_month, sum_price, sum_qty, n_lines,
             |       round(sum_price / CAST(sum_qty AS DOUBLE), 4) AS vwap
             |FROM m ORDER BY l_returnflag, ship_month""".stripMargin)
    ),

    QuerySpec(
      "q_ts_moving_avg",
      (s, dir) => {
        // 7-tick trailing mean + min/max band per series — the rolling
        // indicator shape; mean from integer-scaled sums so window
        // accumulation order can't shift a bit
        val ord = Window.partitionBy("event_type").orderBy(col("ts_us"))
        val w7 = ord.rowsBetween(-6, Window.currentRow)
        evMicros(s, dir)
          .select(
            col("event_type"), col("event_id"),
            row_number().over(ord).cast(LongType).as("rn"),
            round((sum(round(col("value") * 10000.0).cast(LongType)).over(w7) / 10000.0)
              / count(lit(1)).over(w7).cast(DoubleType), 4).as("mavg"),
            min(col("value")).over(w7).as("mmin"),
            max(col("value")).over(w7).as("mmax"))
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, event_id,
             |  CAST(row_number() OVER w AS BIGINT) AS rn,
             |  round((CAST(sum(CAST(round("value" * 10000.0) AS BIGINT)) OVER w7 AS DOUBLE) / 10000.0)
             |        / CAST(count(*) OVER w7 AS DOUBLE), 4) AS mavg,
             |  min("value") OVER w7 AS mmin,
             |  max("value") OVER w7 AS mmax
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)),
             |       w7 AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY event_type, rn""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_ts_volume_bars",
      (s, dir) =>
        // ~10 bars per series at sf0.01 (total scaled notional ≈ 1e9 per
        // type); the target is fixed, so bar COUNT scales with data —
        // the activity-clock property
        TimeSeries.volumeBars(
            evMicros(s, dir).drop("event_id"),
            seriesCol = "event_type", tsMicrosCol = "ts_us",
            priceCol = "value", targetScaledNotional = 100000000L)
          .orderBy("event_type", "bar_id"),
      Some("""WITH o AS (
             |  SELECT event_type, epoch_us(ts) AS ts_us, "value",
             |         CAST(round("value" * 10000.0) AS BIGINT) AS v,
             |         sum(CAST(round("value" * 10000.0) AS BIGINT)) OVER (
             |           PARTITION BY event_type ORDER BY epoch_us(ts)) AS cum
             |  FROM events),
             |b AS (SELECT *, CAST((cum - v) // 100000000 AS BIGINT) AS bar_id FROM o)
             |SELECT event_type, bar_id,
             |       arg_min("value", ts_us) AS "open",
             |       max("value") AS high,
             |       min("value") AS low,
             |       arg_max("value", ts_us) AS "close",
             |       count(*) AS n_ticks,
             |       CAST(sum(v) AS DOUBLE) / 10000.0 AS notional,
             |       min(ts_us) AS bar_start_us,
             |       max(ts_us) AS bar_end_us
             |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    QuerySpec(
      "q_ts_gap_fill",
      (s, dir) =>
        TimeSeries.resampleLastKnown(
            evMicros(s, dir).drop("event_id"),
            seriesCol = "event_type", tsMicrosCol = "ts_us",
            valueCol = "value", stepMicros = HourUs)
          .orderBy("event_type", "grid_us"),
      // DuckDB twin: integer generate_series grid × distinct series,
      // ASOF LEFT JOIN for the last-known fill (same >= tie semantics
      // as AsOfJoin.backward)
      Some("""WITH b AS (
             |  SELECT (epoch_us(min(ts)) // 3600000000) * 3600000000 AS lo,
             |         epoch_us(max(ts)) AS hi
             |  FROM events),
             |g AS (SELECT unnest(generate_series(lo, hi, 3600000000)) AS grid_us FROM b),
             |ty AS (SELECT DISTINCT event_type FROM events),
             |grid AS (SELECT ty.event_type, g.grid_us FROM g CROSS JOIN ty),
             |ev AS (SELECT event_type, epoch_us(ts) AS ts_us, "value" AS last_value,
             |              epoch_us(ts) AS last_ts_us
             |       FROM events)
             |SELECT grid.event_type, grid.grid_us, ev.last_value, ev.last_ts_us
             |FROM grid ASOF LEFT JOIN ev
             |  ON grid.event_type = ev.event_type AND grid.grid_us >= ev.ts_us
             |ORDER BY grid.event_type, grid.grid_us""".stripMargin)
    ),

    QuerySpec(
      "q_ts_returns_vol",
      (s, dir) => {
        // daily close per series → arithmetic daily return (subtract +
        // divide: IEEE-exact on bit-identical closes) → trailing 5-day
        // realized volatility from exact integer sums:
        //   vol² = (n·Σr² − (Σr)²) / (n·(n−1)),  r in 1e-4 units
        val daily = TimeSeries.ohlcBars(
            evMicros(s, dir),
            seriesCol = "event_type", tsMicrosCol = "ts_us",
            priceCol = "value", barMicros = DayUs)
          .select(col("event_type"), col("bar_us"), col("close"))
        val ord = Window.partitionBy("event_type").orderBy(col("bar_us"))
        val w5 = ord.rowsBetween(-4, Window.currentRow)
        val withR = daily
          .withColumn("prev_close", lag(col("close"), 1).over(ord))
          .withColumn("r_scaled",
            round((col("close") - col("prev_close")) / col("prev_close") * 10000.0)
              .cast(LongType))
        withR
          .withColumn("n", count(col("r_scaled")).over(w5))
          .withColumn("s1", sum(col("r_scaled")).over(w5))
          .withColumn("s2", sum(col("r_scaled") * col("r_scaled")).over(w5))
          .select(
            col("event_type"), col("bar_us"),
            col("close"),
            round(col("r_scaled") / 10000.0, 4).as("ret"),
            when(col("n") > 1,
              round(
                sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast(DoubleType)
                  / (col("n") * (col("n") - 1)).cast(DoubleType)) / 10000.0, 4))
              .as("vol5"))
          .orderBy("event_type", "bar_us")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         (epoch_us(ts) // 86400000000) * 86400000000 AS bar_us,
             |         arg_max("value", ts) AS "close"
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT event_type, bar_us, "close",
             |         CAST(round(("close" - lag("close") OVER w) / lag("close") OVER w * 10000.0) AS BIGINT) AS r_scaled
             |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY bar_us)),
             |v AS (
             |  SELECT event_type, bar_us, "close", r_scaled,
             |         count(r_scaled) OVER w5 AS n,
             |         sum(r_scaled) OVER w5 AS s1,
             |         sum(r_scaled * r_scaled) OVER w5 AS s2
             |  FROM r WINDOW w5 AS (PARTITION BY event_type ORDER BY bar_us
             |                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             |SELECT event_type, bar_us, "close",
             |       round(CAST(r_scaled AS DOUBLE) / 10000.0, 4) AS ret,
             |       CASE WHEN n > 1 THEN
             |         round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
             |                    / CAST(n * (n - 1) AS DOUBLE)) / 10000.0, 4)
             |       END AS vol5
             |FROM v ORDER BY event_type, bar_us""".stripMargin)
    )
  )
}
