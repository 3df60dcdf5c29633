package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** `spark.readStream.format("graft-table")`: lakehouse snapshot diffs as
  * Structured Streaming micro-batches, and the exactly-once writeStream
  * counterpart. The offsets are snapshot ids owned by Spark's
  * checkpoint; the delta plan is readIncremental's (pure metadata).
  */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(root: String, name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(root, name), df(Seq(0)).schema, Some("DateTime"))

  private def readStream(table: LakehouseTable, opts: (String, String)*) =
    opts.foldLeft(
      spark.readStream.format("graft-table")
        .option("path", table.tableDir.toString)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  private def memIds(name: String): Seq[Long] =
    spark.sql(s"SELECT EventId FROM $name").collect().map(_.getLong(0)).toSeq

  test("earliest start: batch 0 is the table image, then deltas, exactly once") {
    val root = tmpDir("gts-e2e")
    val src = fresh(root, "src")
    src.append(df(0 until 5))
    val q = readStream(src)
      .writeStream.format("memory").queryName("gts_e2e")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      assert(memIds("gts_e2e").sorted == (0L until 5L), "batch 0 = full image")
      src.append(df(5 until 8))
      src.append(df(8 until 10))
      q.processAllAvailable()
      val got = memIds("gts_e2e")
      assert(got.size == got.distinct.size, "no row may arrive twice")
      assert(got.toSet == (0L until 10L).toSet, "no row may be lost")
    } finally q.stop()
  }

  test("latest start: only commits after the query starts are delivered") {
    val root = tmpDir("gts-latest")
    val src = fresh(root, "src")
    src.append(df(0 until 4)) // pre-existing image: must NOT be delivered
    val q = readStream(src, "startingOffset" -> "latest")
      .writeStream.format("memory").queryName("gts_latest")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      assert(memIds("gts_latest").isEmpty, "latest start delivers no history")
      src.append(df(4 until 6))
      q.processAllAvailable()
      assert(memIds("gts_latest").toSet == Set(4L, 5L))
    } finally q.stop()
  }

  test("restart from the checkpoint resumes without replay or loss") {
    // the memory sink refuses checkpoint recovery, so the restart path
    // is exercised through the graft-table sink — the pairing a real
    // deployment runs (source offsets in the Spark checkpoint, sink
    // idempotence in the table's (queryId, batchId) ledger)
    val root = tmpDir("gts-restart")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 3))
    def run() = readStream(src)
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "gts-restart")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    src.append(df(3 until 6)) // commits while the consumer is down
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
      assert(got.size == got.distinct.size && got.toSet == (0L until 6L).toSet,
        s"restart must neither replay the delivered image nor lose the new delta, got $got")
    } finally q2.stop()
  }

  test("maxSnapshotsPerTrigger bounds catch-up; content stays exactly-once") {
    val root = tmpDir("gts-rate")
    val src = fresh(root, "src")
    src.append(df(Seq(0)))
    val q = readStream(src, "maxSnapshotsPerTrigger" -> "1")
      .writeStream.format("memory").queryName("gts_rate")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(5L))
      .start()
    try {
      q.processAllAvailable() // batch 0: the (uncapped) seed image
      (1 to 4).foreach(i => src.append(df(Seq(i)))) // 4 commits fall behind
      q.processAllAvailable()
      assert(memIds("gts_rate").toSet == (0L to 4L).toSet)
      // the 4 pending commits drain one per trigger (plus the image batch)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 5,
        s"image + 4 capped catch-up deltas expected, saw ${batches.length} non-empty batches")
    } finally q.stop()
  }

  test("filters compose over micro-batches (plan stays declarative)") {
    val root = tmpDir("gts-filter")
    val src = fresh(root, "src")
    src.append(df(0 until 10))
    val q = readStream(src)
      .filter($"EventId" % 2 === 0).select($"EventId", $"Bid")
      .writeStream.format("memory").queryName("gts_filter")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      assert(memIds("gts_filter").toSet == Set(0L, 2L, 4L, 6L, 8L))
    } finally q.stop()
  }

  test("emitUpserts streams MoR upsert images with _commit_seq; max-seq apply converges") {
    val root = tmpDir("gts-upsert")
    val src = fresh(root, "src")
    src.append(df(0 until 4))
    val q = readStream(src, "emitUpserts" -> "true")
      .writeStream.format("memory").queryName("gts_up")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.morMerge(df(Seq(1, 2)).withColumn("Bid", lit(100.0)), "EventId")
      src.morMerge(df(Seq(2, 4)).withColumn("Bid", lit(200.0)), "EventId")
      q.processAllAvailable()
      val images = spark.sql("SELECT EventId, Bid, _commit_seq FROM gts_up").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      // by-key apply: keep the max-_commit_seq image per key
      val applied = images.groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
      val want = src.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(applied == want,
        s"CDC apply must reproduce the table: got $applied want $want")
    } finally q.stop()
  }

  test("plain append-only mode fails loudly on a rewriting commit instead of missing rows") {
    val root = tmpDir("gts-rewrite")
    val src = fresh(root, "src")
    src.append(df(0 until 4))
    val q = readStream(src)
      .writeStream.format("memory").queryName("gts_rw")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.morMerge(df(Seq(1)).withColumn("Bid", lit(9.0)), "EventId")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("emitUpserts") ||
        Option(e.getCause).exists(_.getMessage.contains("emitUpserts")),
        s"error must point at the emitUpserts escape hatch: ${e.getMessage}")
    } finally q.stop()
  }

  test("changeFeed stream: insert/upsert/delete events fold to the table state") {
    val root = tmpDir("gts-cdf")
    val src = fresh(root, "src")
    src.append(df(0 until 6))
    val q = readStream(src, "changeFeed" -> "true")
      .writeStream.format("memory").queryName("gts_cdf")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.append(df(6 until 8))
      src.morMerge(df(Seq(1, 6)).withColumn("Bid", lit(500.0)), "EventId")
      src.morDeleteKeys(Seq(2L).toDF("EventId"), "EventId")
      q.processAllAvailable()
      val events = spark.sql(
        "SELECT EventId, Bid, _change_type, _commit_seq FROM gts_cdf").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      // by-key apply: max-seq event wins; delete ⇒ absent
      val folded = events.groupBy(_._1).flatMap { case (k, es) =>
        val last = es.maxBy(_._4)
        if (last._3 == "delete") None else Some(k -> last._2)
      }
      val want = src.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(folded == want, s"CDC fold must reproduce the table: got $folded want $want")
      assert(events.exists(_._3 == "delete"), "the delete pre-image must stream")
    } finally q.stop()
  }

  test("compaction mid-stream is skipped, not re-delivered") {
    val root = tmpDir("gts-compact")
    val src = fresh(root, "src")
    src.append(df(0 until 3))
    val q = readStream(src)
      .writeStream.format("memory").queryName("gts_compact")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.append(df(3 until 5))
      src.compact()
      src.rewriteManifests()
      src.append(df(5 until 7))
      q.processAllAvailable()
      val got = memIds("gts_compact")
      assert(got.size == got.distinct.size && got.toSet == (0L until 7L).toSet,
        s"compaction moves every row — none may re-deliver, got $got")
    } finally q.stop()
  }

  test("stream-static enrichment join keeps the delta-only scan") {
    val root = tmpDir("gts-join")
    val src = fresh(root, "src")
    src.append(df(0 until 6))
    val dim = Seq((0L, "even"), (1L, "odd")).toDF("parity", "label")
    val q = readStream(src)
      .join(broadcast(dim), col("EventId") % 2 === col("parity"))
      .select($"EventId", $"label")
      .writeStream.format("memory").queryName("gts_join")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.append(df(6 until 8))
      q.processAllAvailable()
      val got = spark.sql("SELECT EventId, label FROM gts_join").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == (0L until 8L).map(i => i -> (if (i % 2 == 0) "even" else "odd")).toMap)
    } finally q.stop()
  }

  test("watermarked window aggregation runs stateful over table micro-batches") {
    val root = tmpDir("gts-window")
    val src = fresh(root, "src")
    // two one-minute buckets of events
    val rows = (0 until 6).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:0${i / 3}%d:0$i%d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")
    src.append(rows)
    val q = readStream(src)
      .withWatermark("DateTime", "10 minutes")
      .groupBy(window($"DateTime", "1 minute"))
      .agg(count(lit(1)).as("n"), sum($"Bid").as("s"))
      .select(col("window.start").as("ws"), col("n"), col("s"))
      .writeStream.format("memory").queryName("gts_window")
      .outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT ws, n, s FROM gts_window").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set(("2024-01-01 00:00:00.0", 3L, 3.0), ("2024-01-01 00:01:00.0", 3L, 12.0)),
        s"stateful windowed agg must work over snapshot micro-batches, got $got")
    } finally q.stop()
  }

  test("changeFeed → cdcApply: delete-aware table-to-table CDC replication") {
    val root = tmpDir("gts-repl")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 6))
    val q = readStream(src, "changeFeed" -> "true")
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "mirror")
      .option("cdcApply", "true").option("keys", "EventId")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    def snapshot(t: graft.lake.LakehouseTable): Map[Long, Double] =
      t.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    try {
      q.processAllAvailable()
      assert(snapshot(dst) == snapshot(src), "batch 0 replicates the image")
      // one micro-batch carrying insert + upsert + delete, including a
      // key UPSERTED THEN DELETED inside the same batch (the fold must
      // let the delete win)
      src.append(df(6 until 8))
      src.morMerge(df(Seq(1, 3)).withColumn("Bid", lit(500.0)), "EventId")
      src.morDeleteKeys(Seq(2L, 3L).toDF("EventId"), "EventId")
      q.processAllAvailable()
      assert(snapshot(dst) == snapshot(src),
        s"replica must converge: dst=${snapshot(dst)} src=${snapshot(src)}")
      assert(!snapshot(dst).contains(3L), "upsert-then-delete folds to delete")
      // crash-replay of the last applied batch id must no-op
      val before = dst.metadata.currentSnapshotId
      assert(dst.morApplyStream("mirror", dst.metadata.streamWatermarks("mirror"),
        df(Seq(0)), spark.emptyDataFrame.selectExpr("CAST(1 AS BIGINT) AS EventId").limit(0),
        Seq("EventId")).isEmpty)
      assert(dst.metadata.currentSnapshotId == before)
    } finally q.stop()
  }

  test("cdcApply replication converges across interleaved source maintenance") {
    // the bounded-state story at 100 TB: per-trigger cost grows with the
    // source's accumulated MoR masks, and MAINTENANCE is what bounds it —
    // so the feed must survive a mid-replication compaction that folds
    // those masks (a rewrite-only commit: rows moved, none added) without
    // re-delivering or missing a row
    val root = tmpDir("gts-repl-maint")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 8))
    val q = readStream(src, "changeFeed" -> "true")
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "mirror-m")
      .option("cdcApply", "true").option("keys", "EventId")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    def snapshot(t: graft.lake.LakehouseTable): Map[Long, Double] =
      t.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    try {
      q.processAllAvailable()
      src.morMerge(df(Seq(1, 4)).withColumn("Bid", lit(100.0)), "EventId")
      src.morDeleteKeys(Seq(2L).toDF("EventId"), "EventId")
      q.processAllAvailable()
      assert(snapshot(dst) == snapshot(src), "pre-maintenance convergence")
      // fold the source's masks mid-replication
      def liveMasks = src.metadata.currentSnapshot.map(src.liveDeleteFiles(_).size).getOrElse(0)
      assert(liveMasks > 0, "fixture must have live masks to fold")
      src.compact()
      assert(liveMasks == 0, "compaction folds the masks away")
      // deltas AFTER the fold: pre-images now come from the compacted,
      // mask-free parent
      src.morMerge(df(Seq(5)).withColumn("Bid", lit(200.0)), "EventId")
      src.morDeleteKeys(Seq(6L).toDF("EventId"), "EventId")
      q.processAllAvailable()
      assert(snapshot(dst) == snapshot(src),
        s"replica must converge across the fold: dst=${snapshot(dst)} src=${snapshot(src)}")
      assert(snapshot(dst)(5L) == 200.0 && !snapshot(dst).contains(6L))
    } finally q.stop()
  }

  test("two-tier CDC chain: bronze -> silver -> gold converges end to end") {
    // the silver table's commits are 'cdc-apply' (images + tombstones in
    // ONE snapshot) — the gold feed must classify them through the
    // exclusion-join path: masked-and-replaced keys emit as upserts,
    // masked-only keys as delete pre-images. This is the replication
    // topology a real deployment chains (region -> hub -> serving).
    val root = tmpDir("gts-chain")
    val bronze = fresh(root, "bronze")
    val silver = fresh(root, "silver")
    val gold = fresh(root, "gold")
    bronze.append(df(0 until 8))
    def mirror(src: LakehouseTable, dst: LakehouseTable, name: String) =
      readStream(src, "changeFeed" -> "true")
        .writeStream.format("graft-table")
        .option("path", dst.tableDir.toString)
        .option("queryId", name)
        .option("cdcApply", "true").option("keys", "EventId")
        .option("checkpointLocation", s"$root/ckpt-$name")
        .trigger(Trigger.ProcessingTime(10L))
        .start()
    val q1 = mirror(bronze, silver, "tier1")
    val q2 = mirror(silver, gold, "tier2")
    def snapshot(t: graft.lake.LakehouseTable): Map[Long, Double] =
      t.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(snapshot(gold) == snapshot(bronze), "images chain through")
      // mixed workload: insert + upsert + delete, including
      // upsert-then-delete of key 3 inside one drain
      bronze.append(df(8 until 10))
      bronze.morMerge(df(Seq(1, 3)).withColumn("Bid", lit(500.0)), "EventId")
      bronze.morDeleteKeys(Seq(2L, 3L).toDF("EventId"), "EventId")
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(snapshot(silver) == snapshot(bronze), "tier 1 converges")
      assert(snapshot(gold) == snapshot(bronze),
        s"tier 2 must converge through cdc-apply commits: " +
          s"gold=${snapshot(gold)} bronze=${snapshot(bronze)}")
      assert(snapshot(gold)(1L) == 500.0 && !snapshot(gold).contains(3L))
    } finally { q1.stop(); q2.stop() }
  }

  test("cdcApply refuses a nondeterministic fold (duplicate keys at one _commit_seq)") {
    val root = tmpDir("gts-dupguard")
    val dst = fresh(root, "dst")
    val sink = new GraftTableSink(spark, dst.tableDir, "dup", Some(Seq("EventId")))
    // a (corrupt) feed batch where key 1 carries TWO upsert images at
    // the same _commit_seq: no deterministic winner exists — the sink
    // must throw, not crown one arbitrarily and diverge the replica
    val corrupt = df(Seq(1)).withColumn("Bid", lit(10.0))
      .unionByName(df(Seq(1)).withColumn("Bid", lit(20.0)))
      .withColumn("_change_type", lit("upsert"))
      .withColumn("_commit_seq", lit(7L))
    // the guard rides the fold projection inside the write job (no
    // separate pre-count pass), so it surfaces as a job failure with
    // the message in the cause chain
    val e = intercept[Exception] { sink.addBatch(0L, corrupt) }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString("\n")
    assert(msgs.contains("refusing to replicate a nondeterministic fold"), msgs)
    assert(dst.metadata.currentSnapshotId.isEmpty, "nothing may commit")
    // a clean batch with DIFFERENT _commit_seqs for the same key is the
    // normal fold: max seq wins deterministically
    val clean = df(Seq(1)).withColumn("Bid", lit(10.0))
      .withColumn("_change_type", lit("upsert")).withColumn("_commit_seq", lit(7L))
      .unionByName(df(Seq(1)).withColumn("Bid", lit(20.0))
        .withColumn("_change_type", lit("upsert")).withColumn("_commit_seq", lit(8L)))
    sink.addBatch(1L, clean)
    val got = dst.read().select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 20.0), s"max-seq image must win, got $got")
  }

  test("streaming write-audit-publish: micro-batches stage on a branch until fastForward") {
    val root = tmpDir("gts-wap")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 3))
    dst.append(df(Seq(99))) // published baseline main readers see
    dst.createBranch("staging")
    val q = readStream(src)
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "wap")
      .option("branch", "staging")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.append(df(3 until 5))
      q.processAllAvailable()
      // main saw NOTHING of the stream; the branch carries everything
      assert(dst.read().select("EventId").collect().map(_.getLong(0)).toSeq == Seq(99L),
        "staged micro-batches must be invisible to main")
      val staged = dst.readBranch("staging").select("EventId").collect()
        .map(_.getLong(0)).toSet
      assert(staged == Set(99L, 0L, 1L, 2L, 3L, 4L))
      // audit passes → publish; main adopts the staged lineage atomically
      dst.fastForward("staging")
      assert(dst.read().select("EventId").collect().map(_.getLong(0)).toSet == staged)
    } finally q.stop()
  }

  test("Trigger.AvailableNow: one-shot backfill drains the backlog and terminates") {
    val root = tmpDir("gts-avnow")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 4))
    src.append(df(4 until 6))
    def backfill(): Unit = {
      val q = readStream(src, "maxSnapshotsPerTrigger" -> "1")
        .writeStream.format("graft-table")
        .option("path", dst.tableDir.toString)
        .option("queryId", "avnow")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000L), "AvailableNow must self-terminate")
    }
    backfill() // cron-style run 1: image + pending deltas, then exit
    assert(dst.read().count() == 6L)
    src.append(df(6 until 8)) // backlog accumulates between runs
    backfill() // cron-style run 2 picks up exactly the backlog
    val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size && got.toSet == (0L until 8L).toSet,
      s"periodic AvailableNow backfills must stay exactly-once, got $got")
  }

  test("Trigger.AvailableNow drains a CAPPED image fully, chunk by chunk") {
    // round 18: the one-shot backfill composes with admission caps —
    // Spark's V1 AvailableNow path re-polls getOffset until no
    // progress, so the capped image's chunk offsets drain to
    // completion in one run instead of stopping at the first chunk
    val root = tmpDir("gts-avncap")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 30).repartition(6)) // 6-file image, 2/trigger
    val q = readStream(src, "maxFilesPerTrigger" -> "2")
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "avncap")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000L), "AvailableNow must self-terminate")
    val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size && got.toSet == (0L until 30L).toSet,
      s"the capped image must drain completely and exactly once, got ${got.sorted}")
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      "6 files under a 2-file cap = 3 chunk triggers")
  }

  test("mid-stream ADD COLUMN: pinned schema keeps flowing; restart sees the new column") {
    val root = tmpDir("gts-evo")
    val src = fresh(root, "src")
    src.append(df(0 until 3))
    def run(name: String) = readStream(src)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$root/ckpt-$name") // memory sink: fresh ckpt per run
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    val q1 = run("gts_evo1")
    try {
      q1.processAllAvailable()
      src.addColumn("Venue", org.apache.spark.sql.types.StringType)
      src.append(df(3 until 5).withColumn("Venue", lit("X")))
      q1.processAllAvailable()
      // the running query's schema was pinned at start: rows flow, the
      // new column is simply not projected (Spark SS contract — schema
      // changes surface on restart)
      assert(memIds("gts_evo1").toSet == (0L until 5L).toSet)
      assert(!spark.table("gts_evo1").columns.contains("Venue"))
    } finally q1.stop()
    val q2 = run("gts_evo2")
    try {
      q2.processAllAvailable()
      val venues = spark.sql("SELECT EventId, Venue FROM gts_evo2").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(venues(4L).contains("X") && venues(0L).isEmpty,
        s"a restarted query reads the evolved schema (nulls backfilled), got $venues")
    } finally q2.stop()
  }

  test("pinOffsets leases the resume chain against snapshot expiry") {
    val root = tmpDir("gts-pin")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 3))
    def run() = readStream(src, "pinOffsets" -> "true")
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "pin")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    val pins = src.tags.keys.filter(_.startsWith("stream-pin/")).toSeq
    assert(pins.size == 1, s"commit must lease the offset, got tags ${src.tags.keys}")

    // consumer goes down; source takes 4 more commits, then an
    // AGGRESSIVE expiry (everything old, keep 1) runs maintenance
    (3 until 7).foreach(i => src.append(df(Seq(i))))
    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    val (expired, _) = src.expireSnapshots(nowMs = farFuture, retentionMs = 0L, keepLast = 1)
    assert(expired.isEmpty,
      s"the lease must hold back expiry of the pin→head chain, expired=$expired")

    // the restarted consumer resumes exactly — nothing was reaped
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
      assert(got.size == got.distinct.size && got.toSet == (0L until 7L).toSet, s"got $got")
    } finally q2.stop()

    // decommission: drop the lease and the chain becomes reapable
    src.dropStreamPin(pins.head.stripPrefix("stream-pin/"))
    val (expired2, _) = src.expireSnapshots(nowMs = farFuture, retentionMs = 0L, keepLast = 1)
    assert(expired2.nonEmpty, "released chain must be expirable again")
  }

  test("filters push into a JOIN-bearing MoR-delta batch's data scan (plan-asserted)") {
    val root = tmpDir("gts-push-mor")
    val src = fresh(root, "src")
    src.append(df(0 until 10))
    val q = readStream(src, "changeFeed" -> "true")
      .filter($"EventId" > 3L)
      .writeStream.format("memory").queryName("gts_push_mor")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      // a delete makes the NEXT batch a join (pre-image mask) — the
      // shape the old shim pinned pre-optimized, stopping downstream
      // pushdown at the LogicalRDD boundary
      src.morDeleteKeys(Seq(5L).toDF("EventId"), "EventId")
      q.processAllAvailable()
      val plan = q match {
        case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
          w.streamingQuery.lastExecution.executedPlan.toString
      }
      assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"),
        s"expected the delete batch to carry a join, plan:\n$plan")
      // spine tagging keeps the parquet leaves pushdown-capable: the
      // downstream filter reaches the reader even through the join
      assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(EventId,3)"),
        s"expected the EventId filter in PushedFilters through the join, plan:\n$plan")
    } finally q.stop()
  }

  test("filters push into the micro-batch parquet scan (plan-asserted)") {
    val root = tmpDir("gts-push")
    val src = fresh(root, "src")
    src.append(df(0 until 10))
    val q = readStream(src)
      .filter($"EventId" > 3L)
      .writeStream.format("memory").queryName("gts_push")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      assert(memIds("gts_push").toSet == (4L until 10L).toSet)
      val plan = q match {
        case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
          w.streamingQuery.lastExecution.executedPlan.toString
      }
      // leaf-tagged micro-batch plans are ordinary parquet scans: the
      // filter must reach the reader as a pushed filter, not run as a
      // post-scan Filter only
      assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(EventId,3)"),
        s"expected the EventId filter in PushedFilters, plan:\n$plan")
    } finally q.stop()
  }

  test("cdcApply replicates on a composite key") {
    val root = tmpDir("gts-ck")
    val withSrc = df(0 until 6).withColumn("Venue", concat(lit("v"), $"EventId" % 2))
    val src = graft.lake.LakehouseTable.createIfNotExists(
      spark, new org.apache.hadoop.fs.Path(root, "src"), withSrc.schema, Some("DateTime"))
    val dst = graft.lake.LakehouseTable.createIfNotExists(
      spark, new org.apache.hadoop.fs.Path(root, "dst"), withSrc.schema, Some("DateTime"))
    src.append(withSrc)
    val q = spark.readStream.format("graft-table")
      .option("path", src.tableDir.toString).option("changeFeed", "true").load()
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "ck").option("cdcApply", "true")
      .option("keys", "EventId,Venue")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    def snap(t: graft.lake.LakehouseTable) =
      t.read().select("EventId", "Venue", "Bid").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    try {
      q.processAllAvailable()
      src.morMerge(
        df(Seq(1, 2)).withColumn("Venue", concat(lit("v"), $"EventId" % 2))
          .withColumn("Bid", lit(900.0)),
        Seq("EventId", "Venue"))
      src.morDeleteKeys(
        Seq((4L, "v0")).toDF("EventId", "Venue"), Seq("EventId", "Venue"))
      q.processAllAvailable()
      assert(snap(dst) == snap(src),
        s"composite-key replica must converge: dst=${snap(dst)} src=${snap(src)}")
      assert(!snap(dst).contains((4L, "v0")))
    } finally q.stop()
  }

  test("latest-mode crash replay keeps its anchored base (no skip, no broken chain)") {
    val root = tmpDir("gts-lbase")
    val src = fresh(root, "src")
    src.append(df(0 until 3)) // pre-start history: must never stream
    val params = Map("path" -> src.tableDir.toString, "startingOffset" -> "latest")
    val provider = new GraftTableSourceProvider
    val metaPath = s"$root/ckpt/sources/0"
    val s1 = provider.createSource(spark.sqlContext, metaPath, None, "graft-table", params)
    // two commits land; the engine offers an offset and writes it to the
    // WAL, then CRASHES before the batch commits
    src.append(df(Seq(3)))
    src.append(df(Seq(4)))
    val end = s1.getOffset.get
    // while down, the table advances further
    src.append(df(Seq(5)))
    // restart: a fresh source instance replays the WAL batch (start=None)
    val s2 = provider.createSource(spark.sqlContext, metaPath, None, "graft-table", params)
    val replay = org.apache.spark.sql.graft.StreamShim.asBatch(
      s2.asInstanceOf[GraftTableSource].getBatch(None, end))
      .select("EventId").collect().map(_.getLong(0)).toSet
    assert(replay == Set(3L, 4L),
      s"replay must deliver exactly the anchored (base, end] delta, got $replay")
  }

  test("stray anchor tmp files are reaped on every resolve, not just the first") {
    val root = tmpDir("gts-tmpreap")
    val src = fresh(root, "src")
    src.append(df(0 until 2))
    val params = Map("path" -> src.tableDir.toString, "startingOffset" -> "latest")
    val provider = new GraftTableSourceProvider
    val metaPath = s"$root/ckpt/sources/0"
    provider.createSource(spark.sqlContext, metaPath, None, "graft-table", params)
    val fs = new Path(metaPath).getFileSystem(spark.sessionState.newHadoopConf())
    val anchor = new Path(metaPath, "graft-latest-base")
    assert(fs.exists(anchor))
    def anchorBytes(): String = {
      val in = fs.open(anchor)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val anchored = anchorBytes()
    // a crash between create and rename strands a tmp NEXT TO the final
    // anchor — only an every-resolve sweep can ever reap it (the
    // first-resolve-only sweep never runs again once the anchor exists,
    // ADVICE r9 (c))
    val stray = new Path(metaPath, "graft-latest-base.tmp-deadbeef")
    val o = fs.create(stray, true)
    o.write("99".getBytes("UTF-8")); o.close()
    provider.createSource(spark.sqlContext, metaPath, None, "graft-table", params)
    assert(!fs.exists(stray), "stray tmp must be reaped on the restart resolve")
    assert(anchorBytes() == anchored, "the real anchor must be untouched")
  }

  test("graft-table writeStream sink: table-to-table streaming with atomic commits") {
    val root = tmpDir("gts-sink")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 5))
    val q = readStream(src)
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "gts-sink-test")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(10L))
      .start()
    try {
      q.processAllAvailable()
      src.append(df(5 until 8))
      q.processAllAvailable()
      val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
      assert(got.size == got.distinct.size && got.toSet == (0L until 8L).toSet,
        s"every source row lands exactly once, got $got")
      // each micro-batch committed atomically with its ledger entry:
      // a crash-replay of the last batch id must no-op
      val before = dst.metadata.currentSnapshotId
      assert(dst.appendStream("gts-sink-test",
        dst.metadata.streamWatermarks("gts-sink-test"), df(0 until 5)).isEmpty)
      assert(dst.metadata.currentSnapshotId == before)
    } finally q.stop()
  }

  // ---- admission control (round 18, VERDICT r17 #2) ----

  private def collectBatch(dfStreaming: org.apache.spark.sql.DataFrame): Seq[Long] =
    org.apache.spark.sql.graft.StreamShim.asBatch(dfStreaming)
      .select("EventId").collect().map(_.getLong(0)).toSeq

  test("maxFilesPerTrigger chunks the batch-0 image: exact per-trigger file counts") {
    val root = tmpDir("gts-imgcap")
    val src = fresh(root, "src")
    src.append(df(0 until 60).repartition(6))
    val nFiles = src.currentDataFiles.size
    assert(nFiles == 6)
    // round-18 writes record per-file sizes in the manifest
    assert(src.currentDataFiles.forall(_.bytes.exists(_ > 0L)),
      "native writes must record DataFile.bytes")
    val s = new GraftTableSource(spark, src.tableDir, emitUpserts = false,
      changeFeed = false, latestBase = None, maxSnapshotsPerTrigger = None,
      caps = Admission.Caps(Some(2L), None))
    val sid = src.metadata.currentSnapshotId.get
    // drive the offset/batch protocol by hand — the per-trigger file
    // counts are exact in the offsets themselves
    var start: Option[org.apache.spark.sql.execution.streaming.Offset] = None
    val ends = scala.collection.mutable.ArrayBuffer.empty[GraftTableOffset]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var off = s.getOffset
    while (off.isDefined) {
      val end = off.get
      rows += collectBatch(s.getBatch(start, end))
      ends += GraftTableOffset.parse(end.json)
      start = Some(end)
      off = s.getOffset
    }
    assert(ends.toSeq == Seq(
      GraftTableOffset(sid, Some(2L)), GraftTableOffset(sid, Some(4L)),
      GraftTableOffset(sid)), "2 files per chunk, completing on the third")
    val all = rows.flatten
    assert(all.size == all.distinct.size, "no row may arrive twice across chunks")
    assert(all.toSet == (0L until 60L).toSet, "chunk union = the exact image")
    assert(rows.forall(_.nonEmpty), "every chunk carries rows")
  }

  test("image chunk replay is deterministic (restart mid-image re-reads the same files)") {
    val root = tmpDir("gts-imgreplay")
    val src = fresh(root, "src")
    src.append(df(0 until 40).repartition(4))
    val sid = src.metadata.currentSnapshotId.get
    def mkSource() = new GraftTableSource(spark, src.tableDir,
      emitUpserts = false, changeFeed = false, latestBase = None,
      maxSnapshotsPerTrigger = None, caps = Admission.Caps(Some(2L), None))
    val a = collectBatch(mkSource().getBatch(
      Some(GraftTableOffset(sid, Some(2L))), GraftTableOffset(sid)))
    val b = collectBatch(mkSource().getBatch(
      Some(GraftTableOffset(sid, Some(2L))), GraftTableOffset(sid)))
    assert(a.sorted == b.sorted && a.nonEmpty,
      "a replayed chunk range must deliver identical rows")
  }

  test("capped image chunks honor MoR delete masks (union = the masked table)") {
    val root = tmpDir("gts-imgmor")
    val src = fresh(root, "src")
    src.append(df(0 until 30).repartition(3))
    src.morDeleteKeys(df(0 until 30).filter($"EventId" % 3 === 0)
      .select("EventId"), "EventId")
    val sid = src.metadata.currentSnapshotId.get
    val s = new GraftTableSource(spark, src.tableDir, emitUpserts = false,
      changeFeed = false, latestBase = None, maxSnapshotsPerTrigger = None,
      caps = Admission.Caps(Some(1L), None))
    var start: Option[org.apache.spark.sql.execution.streaming.Offset] = None
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    var off = s.getOffset
    var guard = 0
    while (off.isDefined && guard < 20) {
      got ++= collectBatch(s.getBatch(start, off.get))
      start = off
      off = s.getOffset
      guard += 1
    }
    // NOTE the delete commit's own snapshot is the image base here (the
    // source starts at current head), so chunks must mask, not replay
    val want = src.read().select("EventId").collect().map(_.getLong(0)).toSet
    assert(want == (0L until 30L).filterNot(_ % 3 == 0).toSet)
    assert(got.toSet == want && got.size == got.distinct.size,
      s"masked chunk union must equal the masked table, got ${got.sorted}")
    assert(GraftTableOffset.parse(start.get.json) == GraftTableOffset(sid))
  }

  test("latestOffset continues a mid-image start after the table advances (restart shape)") {
    // round 18: the admission protocol derives the offer from the
    // CHECKPOINT's start — a restarted driver whose last committed
    // batch ended mid-image must continue THAT image's chunks even
    // though the head moved (the V1 getOffset protocol could not see
    // the start and would have re-offered from the new head, breaking
    // the chunk continuation)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = tmpDir("gts-restartcap")
    val src = fresh(root, "src")
    src.append(df(0 until 30).repartition(6))
    val imageSid = src.metadata.currentSnapshotId.get
    def mkSource() = new GraftTableSource(spark, src.tableDir,
      emitUpserts = false, changeFeed = false, latestBase = None,
      maxSnapshotsPerTrigger = None, caps = Admission.Caps(Some(2L), None))
    val s1 = mkSource()
    val e1 = s1.latestOffset(null, ReadLimit.allAvailable())
    assert(GraftTableOffset.parse(e1.json) == GraftTableOffset(imageSid, Some(2L)))
    val rows1 = collectBatch(s1.getBatch(None, GraftTableOffset.parse(e1.json)))
    src.append(df(30 until 35)) // the head advances while "stopped"
    val s2 = mkSource() // fresh source = restarted driver
    // lag observability: reportLatestOffset is the UNCAPPED head even
    // while the capped offers are still mid-image
    assert(GraftTableOffset.parse(s2.reportLatestOffset().json)
      == GraftTableOffset(src.metadata.currentSnapshotId.get))
    val e2 = s2.latestOffset(e1, ReadLimit.allAvailable())
    assert(GraftTableOffset.parse(e2.json) == GraftTableOffset(imageSid, Some(4L)),
      "the image must continue at its OWN snapshot, not re-offer from the new head")
    val rows2 = collectBatch(s2.getBatch(
      Some(GraftTableOffset.parse(e1.json)), GraftTableOffset.parse(e2.json)))
    val e3 = s2.latestOffset(e2, ReadLimit.allAvailable())
    assert(GraftTableOffset.parse(e3.json) == GraftTableOffset(imageSid),
      "third chunk completes the image")
    val rows3 = collectBatch(s2.getBatch(
      Some(GraftTableOffset.parse(e2.json)), GraftTableOffset.parse(e3.json)))
    val e4 = s2.latestOffset(e3, ReadLimit.allAvailable())
    assert(GraftTableOffset.parse(e4.json).imagePos.isEmpty &&
      GraftTableOffset.parse(e4.json).snapshotId > imageSid,
      "after the image, the mid-restart delta delivers")
    val rows4 = collectBatch(s2.getBatch(
      Some(GraftTableOffset.parse(e3.json)), GraftTableOffset.parse(e4.json)))
    assert(s2.latestOffset(e4, ReadLimit.allAvailable()) == null, "caught up")
    val all = rows1 ++ rows2 ++ rows3 ++ rows4
    assert(all.size == all.distinct.size && all.toSet == (0L until 35L).toSet,
      s"chunks + delta must arrive exactly once across the restart, got ${all.sorted}")
  }

  test("maxFilesPerTrigger splits catch-up deltas at snapshot boundaries (e2e)") {
    // backlog must ACCUMULATE for the cap to matter: run once (image),
    // stop, append 4 commits while the consumer is down, restart — the
    // live-trigger variant delivers each commit as it lands and never
    // tests admission
    val root = tmpDir("gts-deltacap")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(0 until 10).repartition(2)) // seed image: 2 files, fits the cap
    def run() = readStream(src, "maxFilesPerTrigger" -> "4")
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "gts-deltacap")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(5L))
      .start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    // 4 commits × 2 files fall behind; cap 4 files ⇒ 2 snapshots per
    // trigger ⇒ exactly 2 catch-up triggers of 20 rows each
    (1 to 4).foreach(i => src.append(df(i * 10 until (i + 1) * 10).repartition(2)))
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
      assert(got.size == got.distinct.size && got.toSet == (0L until 50L).toSet)
      val catchup = q2.recentProgress.filter(_.numInputRows > 0)
      assert(catchup.length == 2,
        s"4 pending 2-file commits under a 4-file cap = 2 triggers, saw ${catchup.length}")
      assert(catchup.forall(_.numInputRows == 20),
        s"each capped trigger delivers exactly 2 commits (20 rows), got " +
          catchup.map(_.numInputRows).mkString(","))
    } finally q2.stop()
  }

  test("maxBytesPerTrigger bounds delta admission from manifest-recorded sizes") {
    val root = tmpDir("gts-bytecap")
    val src = fresh(root, "src")
    val dst = fresh(root, "dst")
    src.append(df(Seq(0)))
    val seedSize = src.addedSize(src.metadata.currentSnapshot.get, needBytes = true)
    assert(seedSize._2 > 0L, "addedSize must see recorded bytes")
    // cap just above one commit's bytes ⇒ one snapshot per trigger
    def run() = readStream(src, "maxBytesPerTrigger" -> (seedSize._2 + 10).toString)
      .writeStream.format("graft-table")
      .option("path", dst.tableDir.toString)
      .option("queryId", "gts-bytecap")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(5L))
      .start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    (1 to 3).foreach(i => src.append(df(Seq(i)))) // backlog accumulates
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = dst.read().select("EventId").collect().map(_.getLong(0)).toSeq
      assert(got.toSet == (0L to 3L).toSet && got.size == 4)
      val catchup = q2.recentProgress.filter(_.numInputRows > 0)
      assert(catchup.length == 3,
        s"3 pending commits under a one-commit byte cap = 3 triggers, saw ${catchup.length}")
    } finally q2.stop()
  }

  test("capped image then deltas: commits landing mid-image are not skipped (e2e)") {
    val root = tmpDir("gts-imgdelta")
    val src = fresh(root, "src")
    src.append(df(0 until 30).repartition(6)) // image: 6 files, 3 capped chunks
    val q = readStream(src, "maxFilesPerTrigger" -> "2")
      .writeStream.format("memory").queryName("gts_imgdelta")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(5L))
      .start()
    try {
      src.append(df(30 until 35)) // lands while the image is still chunking
      q.processAllAvailable()
      val got = memIds("gts_imgdelta")
      assert(got.size == got.distinct.size && got.toSet == (0L until 35L).toSet,
        s"image chunks + the mid-image delta must all arrive exactly once, got ${got.sorted}")
    } finally q.stop()
  }
}
