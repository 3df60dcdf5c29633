package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Incremental table-to-table mirroring: each step ships exactly the
  * source delta once; idle steps are no-ops; transforms apply; a
  * re-delivered step cannot duplicate rows.
  */
class LakehouseMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("mir"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(t: LakehouseTable): Set[Long] =
    t.read().select("EventId").collect().map(_.getLong(0)).toSet

  test("mirror ships the full first sync, then exact deltas, and idles clean") {
    val src = fresh("src"); val dst = fresh("dst")
    src.append(df(0 until 5))
    src.append(df(5 until 8))

    assert(LakehouseMirror.step(src, dst, "m").isDefined)
    assert(ids(dst) == (0L until 8L).toSet, "first sync ships the full image")

    assert(LakehouseMirror.step(src, dst, "m").isEmpty, "nothing new: no-op")
    assert(dst.read().count() == 8)

    src.append(df(8 until 10))
    src.compact() // maintenance in the delta range is skipped
    assert(LakehouseMirror.step(src, dst, "m").isDefined)
    assert(ids(dst) == (0L until 10L).toSet, "delta is exactly the new rows")
    assert(dst.read().count() == 10)
  }

  test("a replayed step cannot duplicate (watermark is committed with the data)") {
    val src = fresh("rsrc"); val dst = fresh("rdst")
    src.append(df(0 until 4))
    LakehouseMirror.step(src, dst, "m")
    // simulate the crash-replay: the exact same delta delivered again
    // under the already-committed watermark
    assert(dst.appendStream("m", src.metadata.currentSnapshotId.get,
      src.read()).isEmpty)
    assert(dst.read().count() == 4)
  }

  test("an empty-after-transform delta still advances the watermark (ADVICE r6)") {
    val src = fresh("esrc"); val dst = fresh("edst")
    src.append(df(0 until 4))
    LakehouseMirror.step(src, dst, "odds", _.filter($"EventId" % 2 === 1))
    // a delta the filter drops ENTIRELY: no data commit, but the
    // watermark must still move, or every later step re-transforms it
    src.append(df(Seq(6, 8)))
    assert(LakehouseMirror.step(src, dst, "odds",
      _.filter($"EventId" % 2 === 1)).isEmpty)
    assert(dst.metadata.streamWatermarks("odds") == src.metadata.currentSnapshotId.get,
      "watermark must advance past the empty-transform delta")
    // and the next step plans from the advanced watermark: only the new rows
    src.append(df(Seq(9)))
    LakehouseMirror.step(src, dst, "odds", _.filter($"EventId" % 2 === 1))
    assert(ids(dst) == Set(1L, 3L, 9L))
  }

  test("transforms apply per step; independent consumers keep their own offsets") {
    val src = fresh("tsrc"); val dstA = fresh("tdstA"); val dstB = fresh("tdstB")
    src.append(df(0 until 10))
    LakehouseMirror.step(src, dstA, "evens", _.filter($"EventId" % 2 === 0))
    assert(ids(dstA) == Set(0L, 2L, 4L, 6L, 8L))

    LakehouseMirror.step(src, dstB, "all")
    assert(dstB.read().count() == 10)

    src.append(df(10 until 12))
    LakehouseMirror.step(src, dstA, "evens", _.filter($"EventId" % 2 === 0))
    assert(ids(dstA) == Set(0L, 2L, 4L, 6L, 8L, 10L))
    assert(dstB.read().count() == 10, "consumer B has not stepped yet")
  }
}
