package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous dedup through [[DedupStream]]: first-seen docs flow from a
  * raw table to a clean table with the probe index maintained
  * exactly-once alongside — including across the protocol's one real
  * crash window (index committed, destination not, source moved on).
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // exact-text single-band signatures: duplicates = equal text
  private val bandsOf: DataFrame => DataFrame = d =>
    d.select(col("doc_id"), lit(0L).as("band_id"),
      xxhash64(col("text")).as("band_sig"))

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def fixtures(name: String): (LakehouseTable, LakehouseTable, LakehouseTable) = {
    val root = tmpDir("dstream")
    val schema = docs((0L, "x")).schema
    val src = LakehouseTable.createIfNotExists(
      spark, new Path(root, s"$name-src"), schema, None)
    val dst = LakehouseTable.createIfNotExists(
      spark, new Path(root, s"$name-dst"), schema, None)
    val idx = DedupIndex.createIndex(spark, new Path(root, s"$name-idx"))
    (src, dst, idx)
  }

  private def ids(t: LakehouseTable): Set[Long] =
    t.read().select("doc_id").collect().map(_.getLong(0)).toSet

  test("live poller delivers only first-seen docs, exactly once") {
    val (src, dst, idx) = fixtures("live")
    val q = DedupStream.start(src, dst, idx, "clean", bandsOf, pollIntervalMs = 20L)
    try {
      src.append(docs((1L, "a"), (2L, "b"), (3L, "a")))
      Thread.sleep(40L)
      src.append(docs((4L, "b"), (5L, "c")))
      assert(q.awaitCaughtUp(30000L))
    } finally q.stop()
    assert(ids(dst) == Set(1L, 2L, 5L))
    assert(q.lastError.isEmpty)
  }

  test("crash between index and destination commit: merged retry self-heals") {
    val (src, dst, idx) = fixtures("crash")
    val q = new TableStreamQuery(
      src, dst, "clean", DedupStream.transform(idx, dst, "clean", bandsOf),
      pollIntervalMs = 60000L, maxSnapshotsPerBatch = Int.MaxValue,
      emitUpserts = false, cdcKeys = None)

    src.append(docs((1L, "a")))
    assert(q.step())
    assert(ids(dst) == Set(1L))
    val s1 = dst.metadata.streamWatermarks("clean")

    // trigger that indexes batch (s1, s2] but CRASHES before delivering
    src.append(docs((6L, "d")))
    val s2 = src.metadata.currentSnapshotId.get
    DedupIndex.step(idx, bandsOf(src.readIncremental(s1, s2)), "clean", s2,
      settledBefore = Some(s1))
    assert(dst.metadata.streamWatermarks("clean") == s1) // nothing delivered

    // source moves on; newcomer 5 < 6 shares 6's text, 8 is fresh
    src.append(docs((5L, "d"), (8L, "e")))

    // the retried trigger spans the MERGED delta {6,5,8}: first-seen-wins
    // by doc id must keep 5 (not lose both 5 and 6 to the half-committed
    // ghost signatures) and drop 6
    assert(q.step())
    assert(ids(dst) == Set(1L, 5L, 8L))
    assert(!q.step()) // caught up, nothing re-delivered
  }

  test("docs with no signature rows pass through instead of vanishing") {
    val (src, dst, idx) = fixtures("bandless")
    // signatures only for texts of length >= 2: "x" is unfingerprintable
    val sparseBands: DataFrame => DataFrame = d =>
      bandsOf(d.filter(length(col("text")) >= 2))
    val q = DedupStream.start(src, dst, idx, "clean", sparseBands, pollIntervalMs = 20L)
    try {
      src.append(docs((1L, "aa"), (2L, "x"), (3L, "aa")))
      assert(q.awaitCaughtUp(30000L))
    } finally q.stop()
    assert(ids(dst) == Set(1L, 2L)) // 2 passes through, 3 is the real dup
  }

  test("restarting a stopped query resumes from the destination watermark") {
    val (src, dst, idx) = fixtures("resume")
    src.append(docs((1L, "a"), (2L, "b")))
    val q1 = DedupStream.start(src, dst, idx, "clean", bandsOf, pollIntervalMs = 20L)
    try assert(q1.awaitCaughtUp(30000L)) finally q1.stop()
    assert(ids(dst) == Set(1L, 2L))

    src.append(docs((3L, "b"), (4L, "f")))
    val q2 = DedupStream.start(src, dst, idx, "clean", bandsOf, pollIntervalMs = 20L)
    try assert(q2.awaitCaughtUp(30000L)) finally q2.stop()
    assert(ids(dst) == Set(1L, 2L, 4L))
  }
}
