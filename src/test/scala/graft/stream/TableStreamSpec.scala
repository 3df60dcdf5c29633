package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Table-as-stream-source: a live appender races the polled
  * micro-batch reader and every row must arrive at the destination
  * exactly once; offsets live in the destination's atomic metadata, so
  * restarts resume and replays no-op.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("tstream"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(t: LakehouseTable): Seq[Long] =
    t.read().select("EventId").collect().map(_.getLong(0)).toSeq

  test("a live appender races the stream; every row is delivered exactly once") {
    val src = fresh("race-src"); val dst = fresh("race-dst")
    src.append(df(Seq(0))) // non-empty so the first sync is exercised too
    val q = TableStream.start(src, dst, "m", pollIntervalMs = 10L)
    try {
      // 12 disjoint batches appended while the stream is live — batch
      // boundaries race the poller arbitrarily
      (1 to 12).foreach { b =>
        src.append(df(b * 10 until b * 10 + 3))
        Thread.sleep(15L)
      }
      assert(q.awaitCaughtUp(30000L), s"stream must catch up (lastError=${q.lastError})")
      val got = ids(dst)
      val want = (Seq(0) ++ (1 to 12).flatMap(b => b * 10 until b * 10 + 3)).map(_.toLong)
      assert(got.size == got.distinct.size, "no row may be delivered twice")
      assert(got.toSet == want.toSet, "no row may be lost")
      assert(q.lastError.isEmpty)
    } finally q.stop()
    assert(!q.isActive)
  }

  test("rate limiting: catch-up proceeds in bounded per-trigger steps") {
    val src = fresh("rate-src"); val dst = fresh("rate-dst")
    src.append(df(Seq(0)))
    // seed the watermark with a caught-up stopped query
    val q0 = TableStream.start(src, dst, "m", pollIntervalMs = 10L)
    assert(q0.awaitCaughtUp(10000L)); q0.stop()
    // source advances by 5 commits while the consumer is down
    (1 to 5).foreach(i => src.append(df(Seq(i))))
    val q = new TableStreamQuery(src, dst, "m", (d, _) => d, 10L, 1, false)
    // drive deterministically: each step may deliver at most ONE commit
    var steps = 0
    while (q.step()) steps += 1
    assert(steps == 5, s"5 pending commits with maxSnapshotsPerBatch=1 → 5 triggers, got $steps")
    assert(ids(dst).toSet == (0L to 5L).toSet)
    assert(q.batchesCommitted == 5)
  }

  test("file/byte caps bound catch-up at snapshot granularity (round 18)") {
    val src = fresh("cap-src"); val dst = fresh("cap-dst")
    src.append(df(Seq(0)))
    val q0 = TableStream.start(src, dst, "m", pollIntervalMs = 10L)
    assert(q0.awaitCaughtUp(10000L)); q0.stop()
    // 6 single-file commits land while the consumer is down
    (1 to 6).foreach(i => src.append(df(Seq(i))))
    // cap: 2 files per trigger ⇒ 2 commits per step ⇒ 3 steps
    val q = new TableStreamQuery(src, dst, "m", (d, _) => d, 10L,
      Int.MaxValue, false, caps = Admission.Caps(Some(2L), None))
    var steps = 0
    while (q.step()) steps += 1
    assert(steps == 3, s"6 pending 1-file commits under a 2-file cap → 3 steps, got $steps")
    assert(ids(dst).toSet == (0L to 6L).toSet)
    // byte cap: sized to one commit's recorded bytes ⇒ one commit/step
    (7 to 9).foreach(i => src.append(df(Seq(i))))
    val meta = src.metadata
    val oneCommit = src.addedSize(meta.currentSnapshot.get, needBytes = true)._2
    assert(oneCommit > 0L, "commit bytes must be manifest-recorded")
    val qb = new TableStreamQuery(src, dst, "m", (d, _) => d, 10L,
      Int.MaxValue, false, caps = Admission.Caps(None, Some(oneCommit + 10L)))
    var bSteps = 0
    while (qb.step()) bSteps += 1
    assert(bSteps == 3, s"3 pending commits under a one-commit byte cap → 3 steps, got $bSteps")
    assert(ids(dst).toSet == (0L to 9L).toSet)
  }

  test("restart with the same consumerId resumes from the destination's offset") {
    val src = fresh("re-src"); val dst = fresh("re-dst")
    src.append(df(0 until 4))
    val q1 = TableStream.start(src, dst, "m", pollIntervalMs = 10L)
    assert(q1.awaitCaughtUp(10000L)); q1.stop()
    src.append(df(4 until 6))
    val q2 = TableStream.start(src, dst, "m", pollIntervalMs = 10L)
    try {
      assert(q2.awaitCaughtUp(10000L))
      val got = ids(dst)
      assert(got.size == 6 && got.distinct.size == 6,
        "restart must neither replay the first sync nor lose the new delta")
    } finally q2.stop()
  }

  test("a delta that transforms to empty advances the offset; later data still flows") {
    val src = fresh("empty-src"); val dst = fresh("empty-dst")
    src.append(df(Seq(1, 3))) // odds only
    val q = new TableStreamQuery(
      src, dst, "m", (d, _) => d.filter($"EventId" % 2 === 0),
      10L, Int.MaxValue, false)
    q.step()
    assert(dst.read().count() == 0)
    src.append(df(Seq(2))) // an even row
    q.step()
    assert(ids(dst) == Seq(2L))
    assert(!q.step(), "caught up: no further trigger work")
    assert(dst.metadata.streamWatermarks("m") == src.metadata.currentSnapshotId.get)
  }

  test("CDC apply: racing upserts converge to the newest image per key") {
    val src = fresh("cdc-src"); val dst = fresh("cdc-dst")
    src.append(df(0 until 8))
    val q = TableStream.startCdc(src, dst, "cdc", Seq("EventId"), pollIntervalMs = 10L)
    try {
      // five generations of upserts racing the poller: key k's Bid
      // ends at k + 100 * gen for whatever gen last touched it
      (1 to 5).foreach { gen =>
        val batch = df(Seq(gen, gen + 3)) // overlapping key sets per gen
          .withColumn("Bid", col("EventId") + lit(gen * 100.0))
        src.morMerge(batch, "EventId")
        Thread.sleep(20L)
      }
      assert(q.awaitCaughtUp(30000L), s"stream must catch up (lastError=${q.lastError})")
      val got = dst.read().select("EventId", "Bid").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // keys 0..7 from the seed, plus key 8 INSERTED by gen5's upsert
      // (gen 5 touches {5, 8}; an upsert inserts unseen keys)
      assert(got.size == 9, "destination stays keyed: one row per key")
      // last generation touching each key wins
      val lastGen = (0L to 8L).map(k =>
        k -> (1 to 5).filter(g => g.toLong == k || (g + 3).toLong == k).maxOption).toMap
      lastGen.foreach { case (k, gen) =>
        val want = gen.map(g => k + 100.0 * g).getOrElse(k.toDouble)
        assert(got(k) == want, s"key $k: got ${got(k)}, want $want (gen $gen)")
      }
    } finally q.stop()
  }

  test("CDC replay safety: a re-delivered upsert batch no-ops") {
    val src = fresh("cdcr-src"); val dst = fresh("cdcr-dst")
    src.append(df(0 until 3))
    val q = TableStream.startCdc(src, dst, "cdc", Seq("EventId"), pollIntervalMs = 10L)
    try {
      src.morMerge(df(Seq(1)).withColumn("Bid", lit(999.0)), "EventId")
      assert(q.awaitCaughtUp(10000L))
    } finally q.stop()
    val before = dst.read().count()
    // crash-replay of the last batch id
    assert(dst.morMergeStream("cdc", src.metadata.currentSnapshotId.get,
      src.read(), Seq("EventId")).isEmpty)
    assert(dst.read().count() == before)
    assert(dst.read().filter(col("EventId") === 1L).head().getDouble(2) == 999.0)
  }

  test("maintenance commits inside the range are skipped, not duplicated") {
    val src = fresh("mt-src"); val dst = fresh("mt-dst")
    src.append(df(0 until 3))
    val q = new TableStreamQuery(src, dst, "m", (d, _) => d, 10L, Int.MaxValue, false)
    q.step()
    src.append(df(3 until 5))
    src.compact()
    src.rewriteManifests()
    src.append(df(5 until 7))
    while (q.step()) ()
    val got = ids(dst)
    assert(got.size == 7 && got.distinct.size == 7,
      "compaction/fold move every row — none may re-deliver")
  }
}
