package graft.queries

import graft.Tables.t
import graft.ops.{AsOfJoin, RangeJoin, Skew}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operator-surface extensions beyond the reference's own inventory:
  * as-of join, cube / grouping sets, skew-salted join (result-equivalence
  * checked against the plain join), regex and array scalar functions.
  * Every spec is fully oracle-checked — DuckDB has native ASOF JOIN,
  * CUBE/GROUPING, and list kernels to compare against.
  */
object ExtendedOps {

  /** Typed row for the Dataset[T] surface (q_typed_user_stats). */
  final case class Ev(user_id: Long, event_id: Long, value: Double)

  // unscaled-long exact sum — see Relational.decSumD for the rounding-
  // parity and overflow argument
  private def decSumD(c: org.apache.spark.sql.Column) =
    (sum(round(c * 10000.0).cast(LongType)) / 10000.0).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_asof_prev_purchase",
      (s, dir) => {
        // for every event: the user's latest purchase at or before it —
        // the canonical time-series as-of lookup, as a single
        // union+window pass (see AsOfJoin scaladoc for the scale shape)
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
        val purchases = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"),
            unix_micros(col("ts")).as("p_us"),
            col("event_id").as("prev_purchase_id"),
            unix_micros(col("ts")).as("prev_purchase_us"))
        AsOfJoin.backward(ev, purchases,
            keys = Seq("user_id"), leftTs = "ts_us", rightTs = "p_us",
            payloadCols = Seq("prev_purchase_id", "prev_purchase_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
             |     p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS prev_purchase_id
             |           FROM events WHERE event_type = 'purchase')
             |SELECT e.user_id, e.event_id, e.ts_us,
             |       p.prev_purchase_id, p.p_us AS prev_purchase_us
             |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.p_us
             |ORDER BY e.event_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_range_join_pairs",
      (s, dir) => {
        // banded self range join: same-user event pairs within 3 days (the
        // events corpus spans one month, so the band is genuinely
        // selective) — bucketized equality join, never the
        // |user group|² cross product
        val deltaUs = 3L * 24 * 3600 * 1000000L
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
        val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("tu").as("tu_a"))
        val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("tu").as("tu_b"))
        RangeJoin.band(a, b, Seq("user_id"), "tu_a", "tu_b", deltaUs)
          .filter(col("id_a") < col("id_b"))
          .select(col("user_id"), col("id_a"), col("id_b"),
            abs(col("tu_a") - col("tu_b")).as("gap_us"))
          .orderBy("user_id", "id_a", "id_b")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu FROM events)
             |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             |       abs(a.tu - b.tu) AS gap_us
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             | AND abs(a.tu - b.tu) <= 259200000000
             |ORDER BY a.user_id, id_a, id_b""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_cube_revenue",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(
            decSumD(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n_rows"),
            grouping_id().cast(LongType).as("gid"))
          .orderBy(col("gid"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      // Spark grouping_id() and DuckDB GROUPING(a,b) share the same bit
      // encoding (first listed column = most significant bit)
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             |       count(*) AS n_rows,
             |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    ),

    QuerySpec(
      "q_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_orders")
        s.sql("""SELECT o_orderpriority, o_orderstatus,
                |       count(*) AS n_orders,
                |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
                |FROM graft_orders
                |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
                |ORDER BY g_prio, o_orderpriority ASC NULLS FIRST,
                |         o_orderstatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderpriority, o_orderstatus,
             |       count(*) AS n_orders,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
             |ORDER BY g_prio, o_orderpriority ASC NULLS FIRST,
             |         o_orderstatus ASC NULLS FIRST""".stripMargin)
    ),

    QuerySpec(
      "q_skew_salted_join",
      (s, dir) => {
        // salting is an internal rewrite — the contract is exact result
        // equivalence with the unsalted join, which the oracle checks
        val li = t(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_quantity"))
        val ord = t(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderpriority"))
        Skew.saltedJoin(li, ord, Seq("k"), saltFactor = 8)
          .groupBy("o_orderpriority")
          .agg(
            sum(col("l_quantity")).cast(LongType).as("sum_qty"),
            count(lit(1)).as("n_lines"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |       count(*) AS n_lines
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    QuerySpec(
      "q_tumbling_window",
      (s, dir) =>
        // tumbling event-time window (the batch shape of the streaming
        // windowed agg in stream.EventAggregates): 1-day buckets
        t(s, dir, "events")
          .groupBy(window(col("ts").cast("timestamp"), "1 day").as("w"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .select(
            unix_micros(col("w.start")).as("w_start_us"),
            col("n_events"), col("n_users"))
          .orderBy("w_start_us"),
      Some("""SELECT epoch_us(date_trunc('day', ts)) AS w_start_us,
             |       count(*) AS n_events,
             |       count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    QuerySpec(
      "q_window_lead_lag",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_id"),
            lead(col("event_id"), 1).over(w).as("next_id"),
            first(col("event_id")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_id"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  lag(event_id, 1) OVER w AS prev_id,
             |  lead(event_id, 1) OVER w AS next_id,
             |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_id,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)
    ),

    QuerySpec(
      "q_correlated_subquery",
      (s, dir) => {
        // correlated scalar subquery — Catalyst decorrelates this into
        // an aggregate + join, no per-row re-execution
        t(s, dir, "orders").createOrReplaceTempView("graft_orders_sub")
        s.sql("""SELECT o_orderkey, o_custkey FROM graft_orders_sub o
                |WHERE (SELECT count(*) FROM graft_orders_sub o2
                |       WHERE o2.o_custkey = o.o_custkey) >= 10
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey FROM orders o
             |WHERE (SELECT count(*) FROM orders o2
             |       WHERE o2.o_custkey = o.o_custkey) >= 10
             |ORDER BY o_orderkey""".stripMargin)
    ),

    QuerySpec(
      "q_sessionize",
      (s, dir) => {
        // gap-based sessionization: a new session starts after >30 days
        // of inactivity; one sort-shuffle per user, integer math only
        import org.apache.spark.sql.expressions.Window
        val gapUs = 30L * 24 * 3600 * 1000000L
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("new_s",
            when(lag(col("ts_us"), 1).over(w).isNull ||
              col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_ev"))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).cast(LongType).as("n_events"),
            max(col("n_ev")).as("max_session_events"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
             |m AS (SELECT user_id, event_id, ts_us,
             |        CASE WHEN lag(ts_us) OVER w IS NULL
             |               OR ts_us - lag(ts_us) OVER w > 2592000000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |s AS (SELECT user_id, event_id,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |      FROM m),
             |g AS (SELECT user_id, session_id, count(*) AS n_ev FROM s GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions,
             |       CAST(sum(n_ev) AS BIGINT) AS n_events,
             |       CAST(max(n_ev) AS BIGINT) AS max_session_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_typed_user_stats",
      (s, dir) => {
        // the typed Dataset surface: case-class Encoder + groupByKey +
        // mapGroups with imperative per-group logic. Exact-decimal
        // accumulation makes the fold order-insensitive, so the
        // arbitrary group iterator order cannot change the result.
        import s.implicits._
        val ds = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value")).as[Ev]
        ds.groupByKey(_.user_id)
          .mapGroups { (uid, rows) =>
            var n = 0L
            var maxId = Long.MinValue
            var sum = java.math.BigDecimal.ZERO
            rows.foreach { e =>
              n += 1
              maxId = math.max(maxId, e.event_id)
              sum = sum.add(new java.math.BigDecimal(e.value)
                .setScale(4, java.math.RoundingMode.HALF_UP))
            }
            (uid, n, maxId, sum.doubleValue)
          }
          .toDF("user_id", "n_events", "max_event_id", "sum_value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |       max(event_id) AS max_event_id,
             |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    QuerySpec(
      "q_regexp_functions",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_last"),
            col("p_name").rlike("(^| )red( |$)").as("has_red"),
            regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_num"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last,
             |       regexp_matches(p_name, '(^| )red( |$)') AS has_red,
             |       regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    QuerySpec(
      "q_array_functions",
      (s, dir) =>
        // array kernels over the embedding column, scalarized at the
        // output boundary (sum via sequential fold on both engines)
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast(LongType).as("dim"),
            round(array_max(col("embedding")).cast(DoubleType), 4).as("max_v"),
            round(array_min(col("embedding")).cast(DoubleType), 4).as("min_v"),
            round(aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast(DoubleType)), 4).as("sum_v"),
            round(element_at(col("embedding"), 1).cast(DoubleType), 4).as("first_v"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |       CAST(len(embedding) AS BIGINT) AS dim,
             |       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_v,
             |       round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_v,
             |       round(list_reduce(list_prepend(0.0::DOUBLE, embedding::DOUBLE[]),
             |                         (a, b) -> a + b), 4) AS sum_v,
             |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_v
             |FROM embeddings ORDER BY vec_id""".stripMargin)
    ),

    QuerySpec(
      // RANGE frame keyed on a value interval, not a row count: rolling
      // 90-day revenue per customer. Spark's rangeBetween wants a
      // numeric order key, so the NTZ date becomes epoch days and
      // (-90, 0) matches DuckDB's `RANGE INTERVAL 90 DAYS PRECEDING`
      // exactly (both include all date-tie peers). One shuffle on
      // o_custkey; exact unscaled-long sums inside the frame.
      "q_window_range_90d",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-90, 0)
        t(s, dir, "orders")
          .withColumn("d", unix_date(col("o_orderdate").cast(DateType)).cast(LongType))
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("d"),
            (sum(round(col("o_totalprice") * 10000.0).cast(LongType)).over(w) / 10000.0)
              .cast(DoubleType).as("rev90"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(o_orderdate::DATE - DATE '1970-01-01' AS BIGINT) AS d,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate::DATE
             |    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev90
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
    )
  )
}
