package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(ids: Range, yearOf: Int => Int) =
    ids.map(i => (Timestamp.valueOf(f"${yearOf(i)}%04d-01-01 00:00:${i % 60}%02d.$i%06d"), i.toDouble))
      .toDF("DateTime", "Bid")

  test("compact collapses many small appends into one file per partition") {
    val dir = new Path(tmpDir("cmp"), "t")
    val first = mkRows(0 until 10, i => 2020 + (i % 2))
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    (0 until 5).foreach(b => table.append(mkRows(b * 10 until (b + 1) * 10, i => 2020 + (i % 2))))
    val before = table.currentDataFiles.size
    assert(before >= 5) // at least one file per append

    val snap = table.compact()
    assert(snap.operation == "compact")
    assert(snap.totalRows == 50)
    val after = table.currentDataFiles
    assert(after.size == 2, s"expected 1 file per year partition, got $after")
    assert(table.read().count() == 50)
    // contents identical
    assert(table.read().select("Bid").as[Double].collect().sorted.toSeq ==
      (0 until 50).map(_.toDouble))
  }

  test("time travel to pre-compaction snapshots still works") {
    val dir = new Path(tmpDir("cmp"), "t2")
    val first = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    val s1 = table.append(first)
    table.append(mkRows(10 until 20, _ => 2020))
    table.compact()
    assert(table.timeTravel(s1.id).count() == 10)
    assert(table.read().count() == 20)
  }

  test("expiry after compaction deletes the small files once unreferenced") {
    val dir = new Path(tmpDir("cmp"), "t3")
    val first = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    table.append(first)
    table.append(mkRows(10 until 20, _ => 2020))
    val preCompactFiles = table.currentDataFiles.map(_.path).toSet
    table.compact()
    // expire everything but the newest 2 (compact + last append)
    val (expired, orphans) = table.expireSnapshots(
      nowMs = System.currentTimeMillis() + 100L * 24 * 3600 * 1000, keepLast = 1)
    assert(expired.nonEmpty)
    // all pre-compaction files are now orphaned and deleted
    assert(orphans.toSet == preCompactFiles)
    assert(table.read().count() == 20)
  }
}
