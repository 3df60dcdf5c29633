package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator inventory (SURVEY.md §2.1–§2.8), expressed as
  * declarative DataFrame plans so Catalyst gets full pushdown/pruning and
  * whole-stage codegen. Each spec carries a DuckDB oracle.
  *
  * Reference semantics covered here:
  *   - S1/P1/P2 scan + projection + filter  → q_scan_filter_project
  *   - A1 distinct                          → q_distinct_event_types
  *   - A2 min / Q5 positivity               → q_qc_summary
  *   - A3 count                             → q_count_lineitem
  *   - A4/Q3 null fractions                 → q_null_fractions
  *   - J1 anti-join dedup shape             → q_dedup_anti_join
  *   - O1 top-k                             → q_topk_events
  *   - F1/F2 normalization casts            → q_normalize_events
  *   - F11 year partition transform         → q_year_stats_events
  * plus the general join/agg/window/set-op surface Spark gives us for free
  * (SURVEY.md §2.3 note) exercised by the remaining specs.
  */
object Relational {

  /** Exact SUM over a money-ish double, as unscaled 1e-4 longs: integer
    * addition is associative, so partial aggregation order can't change
    * the result, and a primitive long sum stays on the codegen fast path
    * (measured 2× faster than the DECIMAL(18,4) sum it replaces, with
    * bit-identical output — `round` and the decimal cast both round
    * HALF_UP, and the inputs carry ≤4 decimal places). The DuckDB oracle
    * keeps its decimal formulation. Overflow bound: |Σx| < 9.2e14 — ANSI
    * mode raises (never wraps) beyond it; revert to
    * `sum(c.cast(DecimalType(18,4)))` if sums that large are ever real.
    */
  private def decSumD(c: Column): Column =
    (sum(round(c * 10000.0).cast(LongType)) / 10000.0).cast(DoubleType)

  /** Exact mean: exact unscaled sum (as double) / bigint count — one
    * double division, deterministic on both engines. Avoids avg()'s
    * order-dependent double accumulation.
    */
  private def decAvgD(c: Column): Column = decSumD(c) / count(lit(1))

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_scan_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1996-01-01").cast(TimestampNTZType))
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast(LongType).as("l_linenumber"),
            col("l_extendedprice"),
            unix_millis(col("l_shipdate").cast(TimestampType)).as("ship_ms"))
          // (l_orderkey, l_linenumber) is NOT unique in this synthetic
          // lineitem — order by every output column so the sort is total
          .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "ship_ms")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       l_extendedprice, epoch_ms(l_shipdate) AS ship_ms
             |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
             |ORDER BY l_orderkey, l_linenumber, l_extendedprice, ship_ms""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_agg_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).cast(LongType).as("sum_qty"),
            decSumD(col("l_extendedprice")).as("sum_price"),
            decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            decAvgD(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_count_lineitem",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")
    ),

    QuerySpec(
      "q_null_fractions",
      (s, dir) => {
        val df = t(s, dir, "events")
        // A4/Q3: all per-column null counts in ONE aggregation pass — at
        // 100 TB this is one scan, not |columns| scans.
        val nullCounts = df.columns.toSeq.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
        df.agg(count(lit(1)).as("n_rows"), nullCounts: _*)
      },
      // NB: DuckDB's sum(int) yields HUGEINT (int128) — cast to BIGINT or
      // the driver's dtype-sensitive hash-compare mismatches (round 1 bug)
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_id,
             |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ts,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
             |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props
             |FROM events""".stripMargin)
    ),

    QuerySpec(
      "q_qc_summary",
      (s, dir) => {
        // Q1/Q4/Q5 as a single aggregation pass (SURVEY.md §2.8): row
        // threshold, parseable-timestamp count, positivity of the value col.
        t(s, dir, "events").agg(
          count(lit(1)).as("n_rows"),
          count(col("ts")).as("n_valid_ts"),
          min(col("value")).as("min_value"),
          (count(lit(1)) >= 100L).as("enough_rows"),
          (min(col("value")) > 0.0).as("all_positive"))
      },
      Some("""SELECT count(*) AS n_rows, count(ts) AS n_valid_ts,
             |       min(value) AS min_value,
             |       count(*) >= 100 AS enough_rows,
             |       min(value) > 0.0 AS all_positive
             |FROM events""".stripMargin)
    ),

    QuerySpec(
      "q_distinct_event_types",
      (s, dir) =>
        t(s, dir, "events").select("event_type").distinct().orderBy("event_type"),
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")
    ),

    QuerySpec(
      "q_dedup_anti_join",
      (s, dir) => {
        // J1's exact shape: NEW left-anti EXISTING on the logical key.
        // Catalyst/AQE picks broadcast-anti when the build side is small.
        val orders = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"))
        orders
          .join(li, Seq("o_orderkey"), "left_anti")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders o
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_topk_events",
      (s, dir) =>
        t(s, dir, "events")
          .select("event_id", "user_id", "value")
          .orderBy(col("value").desc, col("event_id").asc)
          .limit(10),
      Some("""SELECT event_id, user_id, value FROM events
             |ORDER BY value DESC, event_id LIMIT 10""".stripMargin)
    ),

    QuerySpec(
      "q_year_stats_events",
      (s, dir) =>
        // F11: the reference's YearTransform partition function, as the
        // flagship per-year stats. Emitted as epoch micros (see QuerySpec).
        t(s, dir, "events")
          .groupBy(year(col("ts")).cast(LongType).as("ts_year"))
          .agg(
            count(lit(1)).as("n_rows"),
            min(unix_micros(col("ts"))).as("min_ts_us"),
            max(unix_micros(col("ts"))).as("max_ts_us"))
          .orderBy("ts_year"),
      Some("""SELECT CAST(year(ts) AS BIGINT) AS ts_year, count(*) AS n_rows,
             |       min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    QuerySpec(
      "q_join_agg_revenue",
      (s, dir) => {
        // Three-way join: big fact × mid dim × small dim. customer is tiny
        // → explicit broadcast; orders⋈lineitem shuffles on the join key
        // once and AQE handles skew at scale.
        val li = t(s, dir, "lineitem")
        val orders = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_window_running",
      (s, dir) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            row_number().over(
              Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
              .cast(LongType).as("rn"),
            // unscaled-long running sum: same order-independence argument
            // as decSumD, primitive adds per window row
            (sum(round(col("value") * 10000.0).cast(LongType)).over(w) / 10000.0)
              .cast(DoubleType).as("running_value"))
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
             |FROM events ORDER BY user_id, rn""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_semi_join_customers",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val orders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        cust.join(orders, Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ),

    QuerySpec(
      "q_union_value_buckets",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val hi = ev.filter(col("value") >= 100.0)
          .select(col("event_id"), lit("hi").as("bucket"))
        val lo = ev.filter(col("value") < 10.0)
          .select(col("event_id"), lit("lo").as("bucket"))
        hi.unionByName(lo).orderBy("event_id", "bucket")
      },
      Some("""SELECT event_id, 'hi' AS bucket FROM events WHERE value >= 100.0
             |UNION ALL
             |SELECT event_id, 'lo' AS bucket FROM events WHERE value < 10.0
             |ORDER BY event_id, bucket""".stripMargin)
    ),

    QuerySpec(
      "q_set_ops",
      (s, dir) => {
        // INTERSECT / EXCEPT (distinct set semantics on both engines)
        val ev = t(s, dir, "events")
        val purchasers = ev.filter(col("event_type") === "purchase").select("user_id")
        val errorers = ev.filter(col("event_type") === "error").select("user_id")
        purchasers.intersect(errorers).withColumn("tag", lit("both"))
          .unionByName(purchasers.except(errorers).withColumn("tag", lit("purchase_only")))
          .orderBy("tag", "user_id")
      },
      Some("""SELECT user_id, 'both' AS tag FROM
             |  (SELECT user_id FROM events WHERE event_type = 'purchase'
             |   INTERSECT
             |   SELECT user_id FROM events WHERE event_type = 'error')
             |UNION ALL
             |SELECT user_id, 'purchase_only' AS tag FROM
             |  (SELECT user_id FROM events WHERE event_type = 'purchase'
             |   EXCEPT
             |   SELECT user_id FROM events WHERE event_type = 'error')
             |ORDER BY tag, user_id""".stripMargin)
    ),

    QuerySpec(
      "q_json_extract_props",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    QuerySpec(
      "q_normalize_events",
      (s, dir) =>
        // F1/F2: timestamp → µs-precision normalization + numeric widening,
        // the reference's normalize_arrow_types step as one projection.
        t(s, dir, "events")
          .select(
            col("event_id"),
            unix_micros(col("ts").cast(TimestampType)).as("ts_us"),
            col("value").cast(DoubleType).as("value"))
          .orderBy("event_id"),
      Some("""SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             |       CAST(value AS DOUBLE) AS value
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    QuerySpec(
      "q_agg_orders_priority",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_customers"),
            decSumD(col("o_totalprice")).as("sum_total"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |       count(DISTINCT o_custkey) AS n_customers,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    QuerySpec(
      "q_outer_join_order_lines",
      (s, dir) => {
        // left outer join keeps line-less orders (count = 0 for them)
        val orders = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
        orders.join(li, Seq("o_orderkey"), "left_outer")
          .groupBy("o_orderkey")
          .agg(
            count(col("l_quantity")).as("n_lines"),
            coalesce(sum(col("l_quantity")), lit(0.0)).cast(LongType).as("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(l_quantity) AS n_lines,
             |       CAST(coalesce(sum(l_quantity), 0) AS BIGINT) AS sum_qty
             |FROM orders LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)
    ),

    QuerySpec(
      "q_rollup_revenue",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            decSumD(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      // DuckDB orders NULLS LAST by default — pin NULLS FIRST to match
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    ),

    QuerySpec(
      "q_string_functions",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_name"), 1, 5).as("name_prefix"),
            length(col("p_name")).cast(LongType).as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_type"), " ", "_").as("type_snake"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
             |       substr(p_name, 1, 5) AS name_prefix,
             |       CAST(length(p_name) AS BIGINT) AS name_len,
             |       p_brand || '|' || p_type AS brand_type,
             |       replace(p_type, ' ', '_') AS type_snake
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    QuerySpec(
      "q_math_functions",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            round(sqrt(col("value")), 4).as("sqrt_v"),
            round(pow(col("value"), 2.0), 4).as("sq_v"),
            floor(col("value")).cast(LongType).as("floor_v"),
            ceil(col("value")).cast(LongType).as("ceil_v"),
            abs(col("value") - 50.0).as("abs_dev"),
            round(log(col("value") + 1.0), 4).as("log1p_v"))
          .orderBy("event_id"),
      Some("""SELECT event_id, round(sqrt(value), 4) AS sqrt_v,
             |       round(pow(value, 2.0), 4) AS sq_v,
             |       CAST(floor(value) AS BIGINT) AS floor_v,
             |       CAST(ceil(value) AS BIGINT) AS ceil_v,
             |       abs(value - 50.0) AS abs_dev,
             |       round(ln(value + 1.0), 4) AS log1p_v
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    QuerySpec(
      "q_date_functions",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("y"),
            month(col("o_orderdate")).cast(LongType).as("m"),
            dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
            quarter(col("o_orderdate")).cast(LongType).as("q"),
            unix_millis(date_trunc("month", col("o_orderdate")).cast(TimestampType)).as("month_start_ms"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
             |       CAST(month(o_orderdate) AS BIGINT) AS m,
             |       CAST(day(o_orderdate) AS BIGINT) AS d,
             |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    QuerySpec(
      "q_pivot_event_types",
      (s, dir) =>
        // pivot = conditional aggregation over a known value set; the
        // oracle expresses the same thing with CASE sums
        t(s, dir, "events")
          .groupBy(dayofmonth(col("ts")).cast(LongType).as("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("day"),
      // CAST to BIGINT: DuckDB sum(int) is HUGEINT, Spark count is long
      Some("""SELECT CAST(day(ts) AS BIGINT) AS day,
             |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    QuerySpec(
      "q_unpivot_lineitem",
      (s, dir) =>
        // unpivot/melt: wide metric columns → (metric, value) rows
        t(s, dir, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
            "metric", "v")
          // v in the sort: (l_orderkey, l_linenumber) is not unique here
          .orderBy("l_orderkey", "l_linenumber", "metric", "v"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, metric, v
             |FROM (UNPIVOT lineitem ON l_quantity, l_extendedprice, l_discount, l_tax
             |      INTO NAME metric VALUE v)
             |ORDER BY l_orderkey, l_linenumber, metric, v""".stripMargin)
    ),

    QuerySpec(
      "q_percentiles",
      (s, dir) =>
        // exact interpolated percentiles (Spark `percentile` ≡ DuckDB
        // `quantile_cont`); approximate sketches are exposed via
        // q_approx_distinct (not oracle-able — different sketch impls)
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.95), 4) AS p95,
             |       round(quantile_cont(value, 0.99), 4) AS p99,
             |       count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    QuerySpec(
      "q_approx_percentile",
      (s, dir) =>
        // sketch contract (like q_approx_distinct): the approximate
        // median must land inside the exact interquartile range; the
        // exact median is value-checked
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
            expr("approx_percentile(value, 0.5, 10000)").as("ap"),
            expr("percentile(value, 0.25)").as("q1"),
            expr("percentile(value, 0.75)").as("q3"))
          .select(
            col("event_type"), col("p50_exact"),
            (col("ap") >= col("q1") && col("ap") <= col("q3")).as("approx_in_iqr"))
          .orderBy("event_type"),
      Some("""SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_exact,
             |       true AS approx_in_iqr
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    QuerySpec(
      "q_approx_distinct",
      (s, dir) =>
        // HLL++ sketch: deterministic under any partitioning (register
        // merges are max-based, so commutative) but not reproducible in
        // DuckDB — so the oracle checks the sketch's error CONTRACT
        // (|approx − exact| ≤ 10% at rsd 0.02, generous and stable for
        // fixed data) plus the exact count, instead of the raw estimate
        t(s, dir, "events")
          .agg(
            approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          .select(
            (col("approx_users") >= col("exact_users") * 0.9 &&
              col("approx_users") <= col("exact_users") * 1.1).as("within_bounds"),
            col("exact_users")),
      Some("""SELECT true AS within_bounds,
             |       count(DISTINCT user_id) AS exact_users FROM events""".stripMargin)
    ),

    QuerySpec(
      "q_agg_heavy_hitters",
      (s, dir) =>
        // two-pass exact heavy hitters: a Misra–Gries sketch nominates
        // ≤ ⌈1/phi⌉ candidates (the shuffle carries per-partition
        // summaries, never raw keys), then exact counts over only the
        // candidates apply the threshold. The MG mergeability guarantee
        // makes the output EXACT and merge-order-independent, so the
        // oracle is the plain GROUP BY … HAVING it replaces at scale
        graft.ops.Sketches.heavyHitters(t(s, dir, "events"), "user_id", 0.008)
          .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
             |HAVING count(*) > CAST(floor(0.008 * (SELECT count(*) FROM events)) AS BIGINT)
             |ORDER BY user_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_priority_late_orders",
      (s, dir) => {
        // TPC-H Q4 shape: EXISTS-correlated semi join between orders and
        // their late lineitems (shipped >90 days after the order date —
        // this corpus has no l_commitdate), counted per priority
        val orders = t(s, dir, "orders").as("o")
        val li = t(s, dir, "lineitem").as("l")
        orders.join(li,
            col("l.l_orderkey") === col("o.o_orderkey") &&
              col("l.l_shipdate") > col("o.o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    QuerySpec(
      "q_customer_order_distribution",
      (s, dir) => {
        // TPC-H Q13 shape: customers (including order-less ones) bucketed
        // by how many orders they have — outer join + double aggregation
        val cust = t(s, dir, "customer").select("c_custkey")
        val orders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
        cust.join(orders, Seq("c_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    QuerySpec(
      "q_join_nation_customers",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val nation = t(s, dir, "nation")
        cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n_customers"),
            decSumD(col("c_acctbal")).as("sum_acctbal"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_customers,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
    )
  )
}
