package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

/** Crash-window recovery of the snapshot log's commit protocol. */
class CommitRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
    .toDF("DateTime", "Bid")

  private def fsFor(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  test("a crashed commit's orphaned version file does not wedge the table") {
    val dir = new Path(tmpDir("recov"), "t")
    val table = LakehouseTable.createIfNotExists(spark, dir, base.schema, Some("DateTime"))
    // simulate a writer that died after writing v1.json but before the
    // pointer swap: v1.json exists, VERSION still points at v0
    val fs = fsFor(dir)
    val orphan = new Path(dir, "metadata/v1.json")
    val out = fs.create(orphan, false)
    out.write("{\"crashed\": true}".getBytes("UTF-8")); out.close()
    // backdate past the stale threshold: only an old leftover is
    // unambiguously a crash (a fresh one could be an in-flight commit)
    fs.setTimes(orphan, System.currentTimeMillis() - 10 * 60 * 1000L, -1)
    assert(table.log.currentVersion === 0L)

    table.append(base) // must reclaim the leftover and commit v1 for real
    assert(table.log.currentVersion === 1L)
    assert(table.read().count() === 1L)
    assert(table.snapshots.size === 1)
  }

  test("a FRESH leftover version file is treated as in-flight, not reclaimed") {
    val dir = new Path(tmpDir("recov"), "t4")
    val table = LakehouseTable.createIfNotExists(spark, dir, base.schema, Some("DateTime"))
    val fs = fsFor(dir)
    val inFlight = new Path(dir, "metadata/v1.json")
    val out = fs.create(inFlight, false)
    out.write("{\"inflight\": true}".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] { table.append(base) }
    assert(e.getMessage.contains("in-flight"))
    assert(fs.exists(inFlight)) // the other writer's file is untouched
  }

  test("removeOrphanedFiles reaps staging dirs from crashed writes") {
    val dir = new Path(tmpDir("recov"), "t3")
    val table = LakehouseTable.createIfNotExists(spark, dir, base.schema, Some("DateTime"))
    table.append(base)
    val fs = fsFor(dir)
    val staleStaging = new Path(dir, ".staging-deadbeef/part-0.parquet")
    val out = fs.create(staleStaging, true)
    out.write(1); out.close()
    val deleted = table.removeOrphanedFiles()
    assert(deleted.contains(".staging-deadbeef"))
    assert(!fs.exists(new Path(dir, ".staging-deadbeef")))
    assert(table.read().count() === 1L)
  }

  test("a genuinely concurrent commit (pointer moved) is still rejected") {
    val dir = new Path(tmpDir("recov"), "t2")
    val table = LakehouseTable.createIfNotExists(spark, dir, base.schema, Some("DateTime"))
    val staleVersion = table.log.currentVersion // 0
    table.append(base) // moves the pointer to v1
    val e = intercept[IllegalArgumentException] {
      table.log.commit(staleVersion, table.metadata) // would re-write v1.json
    }
    assert(e.getMessage.contains("concurrent commit"))
  }
}
