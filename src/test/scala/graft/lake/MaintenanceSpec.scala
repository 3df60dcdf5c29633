package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

/** The composite maintenance cycle: compact on small-file pressure,
  * fold manifests on chain growth, always expire — with thresholds that
  * make a healthy table a no-op.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def batch(b: Int, day: Int = 1) =
    (0 until 10).map(i =>
      (Timestamp.valueOf(f"2024-01-$day%02d 00:$b%02d:${i % 60}%02d.$i%06d"), (b * 100 + i).toDouble))
      .toDF("DateTime", "Bid").coalesce(1)

  test("small-file pressure triggers compaction; the rest of the cycle still runs") {
    val dir = new Path(tmpDir("maint"), "t1")
    val table = LakehouseTable.createIfNotExists(spark, dir, batch(0).schema, Some("DateTime"))
    (0 until 6).foreach(b => table.append(batch(b)))
    // one year partition, 6 files > 4×1 → compact; expiry reaps the
    // older pre-compaction snapshots but deletes NO file yet — the
    // newest pre-compaction snapshot is still inside keepLast=2 and
    // references every small file (the protection working as designed)
    val r = table.maintain(retentionMs = 0L)
    assert(r.compacted)
    assert(!r.manifestsFolded, "compaction already collapses the chain")
    assert(r.expiredSnapshots > 0)
    assert(r.deletedFiles == 0, "files of a protected snapshot must survive")
    assert(table.read().count() == 60L)

    // one more append ages that snapshot out of the window: the next
    // cycle reaps the stranded small files
    table.append(batch(9))
    val r2 = table.maintain(retentionMs = 0L)
    assert(!r2.compacted, "2 files in 1 partition is healthy")
    assert(r2.expiredSnapshots > 0)
    assert(r2.deletedFiles > 0, "stranded pre-compaction files must now be reaped")
    assert(table.read().count() == 70L)
  }

  test("manifest chain growth without small-file pressure folds the chain") {
    val dir = new Path(tmpDir("maint"), "t2")
    val table = LakehouseTable.createIfNotExists(spark, dir, batch(0).schema, Some("DateTime"), "day")
    // 10 appends into 10 DIFFERENT day partitions: 1 file per partition
    // (no compaction pressure) but a 10-manifest chain (> 8)
    (1 to 10).foreach(d => table.append(batch(0, day = d)))
    val chainBefore = table.log.readManifestList(table.metadata.currentSnapshot.get).size
    assert(chainBefore == 10)
    val r = table.maintain(retentionMs = Long.MaxValue) // nothing old enough to expire
    assert(!r.compacted)
    assert(r.manifestsFolded)
    assert(r.expiredSnapshots == 0 && r.deletedFiles == 0)
    assert(table.log.readManifestList(table.metadata.currentSnapshot.get).size == 1)
    assert(table.read().count() == 100L)
  }

  test("a healthy table is a no-op") {
    val dir = new Path(tmpDir("maint"), "t3")
    val table = LakehouseTable.createIfNotExists(spark, dir, batch(0).schema, Some("DateTime"))
    table.append(batch(0))
    val filesBefore = table.currentDataFiles.toSet
    val versionBefore = table.log.currentVersion
    val r = table.maintain(retentionMs = Long.MaxValue)
    assert(r == MaintenanceReport(false, false, 0, 0))
    assert(table.currentDataFiles.toSet == filesBefore)
    assert(table.log.currentVersion == versionBefore, "a no-op cycle must not commit")
  }
}
