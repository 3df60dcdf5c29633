package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import graft.stream.IncrementalRollup.RollupDef
import org.apache.hadoop.fs.Path

class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String, schema: org.apache.spark.sql.types.StructType) =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("rollup"), name), schema, None)

  private val d = RollupDef(
    keys = Seq("sym"), sumCols = Seq("px"), minMaxCols = Seq("px"))

  private def src(rows: Seq[(String, Long, Double)]): LakehouseTable = {
    val df = rows.toDF("sym", "ts_us", "px")
    val t = freshTable("bronze", df.schema)
    t.append(df)
    t
  }

  private def rollupState(dst: LakehouseTable): Map[String, (Long, Long, Double, Double)] =
    dst.read().collect().map(r => r.getAs[String]("sym") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_px"),
        r.getAs[Double]("min_px"), r.getAs[Double]("max_px"))).toMap

  test("state after incremental refreshes equals the one-shot aggregate") {
    val bronze = src(Seq(("a", 1L, 1.5), ("a", 2L, 2.5), ("b", 3L, 10.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)

    assert(IncrementalRollup.step(bronze, gold, "mv", d)) // full first image
    bronze.append(Seq(("a", 4L, 4.0), ("c", 5L, 7.0)).toDF("sym", "ts_us", "px"))
    bronze.append(Seq(("c", 6L, 1.0)).toDF("sym", "ts_us", "px"))
    assert(IncrementalRollup.step(bronze, gold, "mv", d)) // two commits, one delta

    val expected = IncrementalRollup.aggregate(bronze.read(), d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rollupState(gold) == expected)
    // spot-check the merged math: a = 1.5+2.5+4.0, scaled
    assert(rollupState(gold)("a") == ((3L, 80000L, 1.5, 4.0)))
  }

  test("caught-up refresh is a no-op and replayed delivery cannot double-apply") {
    val bronze = src(Seq(("a", 1L, 1.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)
    assert(IncrementalRollup.step(bronze, gold, "mv", d))
    assert(!IncrementalRollup.step(bronze, gold, "mv", d)) // watermark holds
    // crash-replay of the already-committed batch id must no-op at the sink
    val batchId = bronze.metadata.currentSnapshotId.get
    val replay = gold.morMergeStream("mv",
      batchId, IncrementalRollup.aggregate(bronze.read(), d), d.keys)
    assert(replay.isEmpty)
    assert(rollupState(gold)("a") == ((1L, 10000L, 1.0, 1.0)))
  }

  test("untouched keys are not rewritten by a refresh") {
    val bronze = src(Seq(("a", 1L, 1.0), ("b", 2L, 2.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)
    IncrementalRollup.step(bronze, gold, "mv", d)
    val filesBefore = gold.metadata.currentSnapshot.get.totalRows
    bronze.append(Seq(("b", 3L, 3.0)).toDF("sym", "ts_us", "px"))
    IncrementalRollup.step(bronze, gold, "mv", d)
    // only b's image was upserted; a's stored row survives merge-on-read
    assert(rollupState(gold) ==
      Map("a" -> ((1L, 10000L, 1.0, 1.0)), "b" -> ((2L, 50000L, 2.0, 3.0))))
  }

  test("maintenance-only source commits advance the watermark without data") {
    val bronze = src(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)
    IncrementalRollup.step(bronze, gold, "mv", d)
    bronze.compact() // rewrite-only commit: delta must aggregate to nothing
    assert(IncrementalRollup.step(bronze, gold, "mv", d)) // watermark moves
    assert(!IncrementalRollup.step(bronze, gold, "mv", d))
    assert(rollupState(gold)("a") == ((2L, 30000L, 1.0, 2.0)))
  }

  test("managed maintainer converges against a live appender") {
    val bronze = src(Seq(("a", 0L, 1.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)
    val q = IncrementalRollup.start(bronze, gold, "mv", d, pollIntervalMs = 20L)
    try {
      (1 to 4).foreach { i =>
        bronze.append(Seq(("a", i.toLong, i.toDouble), ("b", i.toLong, 2.0 * i))
          .toDF("sym", "ts_us", "px"))
        Thread.sleep(15L)
      }
      assert(q.awaitCaughtUp(30000L), s"rollup never caught up: ${q.lastError}")
    } finally q.stop()
    val expected = IncrementalRollup.aggregate(bronze.read(), d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rollupState(gold) == expected)
    assert(q.refreshes >= 1)
  }

  test("distinct-count sketch column merges across refreshes; estimate exact at small cardinality") {
    val dd = RollupDef(keys = Seq("sym"), sumCols = Nil, minMaxCols = Nil,
      distinctCols = Seq("uid"))
    val rows1 = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L))
    val rows2 = Seq(("a", 2L), ("a", 3L), ("b", 7L), ("b", 8L), ("c", 1L))
    val df1 = rows1.toDF("sym", "uid")
    val bronze = freshTable("bronze", df1.schema)
    bronze.append(df1)
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), dd).schema)
    assert(IncrementalRollup.step(bronze, gold, "mv", dd))
    bronze.append(rows2.toDF("sym", "uid"))
    assert(IncrementalRollup.step(bronze, gold, "mv", dd))
    // overlap across the two refreshes (a:2, b:7) must not double-count
    val got = IncrementalRollup.readRollup(gold, dd).collect()
      .map(r => r.getAs[String]("sym") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("nd_uid"))).toMap
    assert(got == Map("a" -> ((5L, 3L)), "b" -> ((3L, 2L)), "c" -> ((1L, 1L))), s"got $got")
  }

  test("quantile sketch column: incremental state equals one-shot; estimates within bound") {
    import org.apache.spark.sql.functions._
    val dq = RollupDef(keys = Seq("sym"), quantileCols = Seq("px"),
      quantiles = Seq(0.5, 0.95))
    // skewed per-key distributions, refreshed in three waves
    def wave(w: Int) = (1 to 200).map(i =>
      ("s" + (i % 2), (w * 1000 + i).toLong, (i * i * (w + 1)).toDouble / 7.0))
    val bronze = src(wave(0))
    val gold = freshTable("gold-q",
      IncrementalRollup.aggregate(bronze.read(), dq).schema)
    assert(IncrementalRollup.step(bronze, gold, "mvq", dq))
    bronze.append(wave(1).toDF("sym", "ts_us", "px"))
    bronze.append(wave(2).toDF("sym", "ts_us", "px"))
    assert(IncrementalRollup.step(bronze, gold, "mvq", dq))

    // merged-across-refreshes histogram == the one-shot full aggregate
    // (the sketch is a pure function of the multiset)
    val maintained = gold.read().select("sym", "qh_px").collect()
      .map(r => r.getString(0) -> r.getMap[Long, Long](1).toMap).toMap
    val oneShot = IncrementalRollup.aggregate(bronze.read(), dq)
      .select("sym", "qh_px").collect()
      .map(r => r.getString(0) -> r.getMap[Long, Long](1).toMap).toMap
    assert(maintained == oneShot, "merge-order independence must hold exactly")

    // surfaced quantiles within the half-bucket relative bound of exact
    val got = IncrementalRollup.readRollup(gold, dq).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("p50_px"), r.getAs[Double]("p95_px")))
      .toMap
    val all = (wave(0) ++ wave(1) ++ wave(2)).groupBy(_._1)
      .view.mapValues(_.map(t => math.round(t._3 * 10000.0)).sorted).toMap
    for ((sym, (p50, p95)) <- got; (q, est) <- Seq(0.5 -> p50, 0.95 -> p95)) {
      val vs = all(sym)
      val exact = vs(math.max(1, math.ceil(q * vs.size).toInt) - 1) / 10000.0
      assert(math.abs(est - exact) / exact <= 1.0 / (2 * graft.ops.HdrQuantile.M) + 1e-9,
        s"$sym q=$q: est $est vs exact $exact")
    }
  }

  test("a null-keyed group keeps its quantile sketch (null-safe sketch join)") {
    val dq = RollupDef(keys = Seq("sym"), quantileCols = Seq("px"), quantiles = Seq(0.5))
    val rows = Seq((Option("a"), 1L, 10.0), (None, 2L, 20.0), (None, 3L, 30.0))
      .toDF("sym", "ts_us", "px")
    val agg = IncrementalRollup.aggregate(rows, dq).collect()
      .map(r => Option(r.getString(0)) -> r.isNullAt(r.fieldIndex("qh_px"))).toMap
    assert(agg(Some("a")) == false)
    assert(agg(None) == false,
      "the NULL key group has non-null values — its sketch must survive the join")
  }

  test("a row-rewriting source commit fails the refresh loudly") {
    val bronze = src(Seq(("a", 1L, 1.0), ("b", 2L, 2.0)))
    val gold = freshTable("gold",
      IncrementalRollup.aggregate(bronze.read(), d).schema)
    IncrementalRollup.step(bronze, gold, "mv", d)
    bronze.delete(org.apache.spark.sql.functions.col("sym") === "a") // COW rewrite
    val e = intercept[Exception] {
      IncrementalRollup.step(bronze, gold, "mv", d)
    }
    assert(e.getMessage.contains("removed or rewrote"))
  }
}
