package graft.lake

import graft.SparkSpec
import graft.ingest.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.util.Random

/** Property-style invariant tests (seeded randomized cases) for the
  * SURVEY.md §5.3 invariants: dedup (no duplicate keys after any append
  * sequence), idempotence (re-appending a batch is a no-op), and expiry
  * (the newest 2 snapshots and the current snapshot always survive).
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toDouble))
      .toDF("DateTime", "Bid")

  private def freshTable(name: String) = {
    val schema = df(Seq(0)).schema
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("inv"), name), schema, Some("DateTime"))
  }

  /** The pipeline's append discipline: within-batch dedup, then the
    * anti-join against table history (mirrors IngestPipeline).
    */
  private def appendDeduped(table: LakehouseTable, ids: Seq[Int]): Long = {
    val fresh = Dedup.dropExisting(
      Dedup.withinBatch(df(ids), Seq("DateTime")), table, "DateTime")
    val n = fresh.count()
    if (n > 0) table.append(fresh)
    n
  }

  test("dedup invariant: no duplicate keys after any random append sequence") {
    (1 to 5).foreach { caseNo =>
      val table = freshTable(s"dedup$caseNo")
      val all = scala.collection.mutable.Set.empty[Int]
      (1 to 4).foreach { _ =>
        val ids = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(60))
        appendDeduped(table, ids)
        all ++= ids
      }
      val keys = table.read().select("DateTime").collect().map(_.get(0))
      assert(keys.length == keys.distinct.length, s"case $caseNo: duplicate keys")
      assert(keys.length == all.size, s"case $caseNo: lost or invented keys")
    }
  }

  test("idempotence: re-appending an already-ingested batch adds nothing") {
    (1 to 5).foreach { caseNo =>
      val table = freshTable(s"idem$caseNo")
      val ids = Seq.fill(rnd.nextInt(40) + 5)(rnd.nextInt(100)).distinct
      appendDeduped(table, ids)
      val before = table.read().count()
      val added = appendDeduped(table, ids)
      assert(added == 0, s"case $caseNo: re-append added $added rows")
      assert(table.read().count() == before)
      assert(table.snapshots.size == 1, s"case $caseNo: phantom snapshot")
    }
  }

  test("expiry invariant: newest 2 and current always survive any timestamp layout") {
    (1 to 10).foreach { caseNo =>
      val dir = new Path(tmpDir("inv"), s"exp$caseNo")
      val log = new SnapshotLog(dir, spark.sessionState.newHadoopConf())
      val n = rnd.nextInt(6) + 2
      val now = 1700000000000L
      val snaps = (1 to n).map { i =>
        Snapshot(i.toLong, if (i == 1) None else Some(i - 1L),
          now - rnd.nextInt(30).toLong * 24 * 3600 * 1000, // 0-30 days old
          "append", None, None, 0, 0L, 0L)
      }
      log.create(TableMetadata(SnapshotLog.CurrentFormatVersion,
        s"exp$caseNo", "id BIGINT", Nil, None, snaps, Some(n.toLong)))
      val table = new LakehouseTable(spark, dir, log)
      table.expireSnapshots(nowMs = now)
      val left = table.snapshots
      val newest2 = snaps.sortBy(s => (-s.timestampMs, -s.id)).take(2).map(_.id).toSet
      assert(newest2.subsetOf(left.map(_.id).toSet), s"case $caseNo: newest-2 violated")
      assert(left.exists(_.id == n.toLong), s"case $caseNo: current snapshot dropped")
      assert(left.forall(s =>
        newest2.contains(s.id) || s.id == n.toLong ||
          s.timestampMs >= now - 7L * 24 * 3600 * 1000),
        s"case $caseNo: an expirable snapshot survived")
    }
  }
}
