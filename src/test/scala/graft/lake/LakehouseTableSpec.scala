package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class LakehouseTableSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(ids: Range, yearOf: Int => Int) =
    ids.map(i => (Timestamp.valueOf(f"${yearOf(i)}%04d-01-01 00:00:${i % 60}%02d.${i}%06d"), i.toDouble, i.toLong))
      .toDF("DateTime", "Bid", "id")

  test("append → read roundtrip preserves rows and derives year partition") {
    val dir = new Path(tmpDir("lht"), "t1")
    val df = mkRows(0 until 100, i => 2020 + (i % 3))
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    val snap = table.append(df)
    assert(snap.addedRows == 100)
    assert(snap.totalRows == 100)
    val back = table.read()
    assert(back.count() == 100)
    assert(back.columns.contains("DateTime_year"))
    assert(back.select("DateTime_year").distinct().as[Int].collect().sorted.toSeq == Seq(2020, 2021, 2022))
    // partition column must agree with the derived year
    assert(back.filter(year($"DateTime") =!= $"DateTime_year").count() == 0)
  }

  test("second append accumulates; time travel sees the old snapshot") {
    val dir = new Path(tmpDir("lht"), "t2")
    val df1 = mkRows(0 until 50, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df1.schema, Some("DateTime"))
    val s1 = table.append(df1)
    val s2 = table.append(mkRows(100 until 130, _ => 2021))
    assert(table.read().count() == 80)
    assert(table.timeTravel(s1.id).count() == 50)
    assert(table.timeTravel(s2.id).count() == 80)
    assert(table.metadata.currentSnapshotId.contains(s2.id))
  }

  test("empty table reads as empty DataFrame with schema") {
    val dir = new Path(tmpDir("lht"), "t3")
    val df = mkRows(0 until 1, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    assert(table.read().count() == 0)
    assert(table.read().columns.toSet == Set("DateTime", "Bid", "id", "DateTime_year"))
  }

  test("createIfNotExists is idempotent (schema frozen at creation)") {
    val dir = new Path(tmpDir("lht"), "t4")
    val df = mkRows(0 until 10, _ => 2020)
    LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime")).append(df)
    val again = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    assert(again.read().count() == 10)
    assert(again.snapshots.size == 1)
  }

  test("expiry keeps newest 2 and current, deletes orphaned files") {
    val dir = new Path(tmpDir("lht"), "t5")
    val df = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    val s1 = table.append(mkRows(0 until 10, _ => 2020))
    val s2 = table.append(mkRows(10 until 20, _ => 2020))
    val s3 = table.append(mkRows(20 until 30, _ => 2020))
    // everything is "old" vs a far-future now, but newest 2 are protected
    val (expired, orphans) = table.expireSnapshots(
      nowMs = System.currentTimeMillis() + 100L * 24 * 3600 * 1000)
    assert(expired == Seq(s1.id))
    // s1's files are still in s2/s3 manifests (append accumulates), so no orphans
    assert(orphans.isEmpty)
    assert(table.snapshots.map(_.id).toSet == Set(s2.id, s3.id))
    assert(table.read().count() == 30) // current data untouched
  }

  test("expiry is a no-op with ≤1 snapshot or all-recent snapshots") {
    val dir = new Path(tmpDir("lht"), "t6")
    val df = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    table.append(df)
    assert(table.expireSnapshots() == ((Nil, Nil)))
    table.append(mkRows(10 until 20, _ => 2020))
    table.append(mkRows(20 until 30, _ => 2020))
    // all snapshots newer than the 7-day cutoff → nothing eligible
    assert(table.expireSnapshots() == ((Nil, Nil)))
    assert(table.snapshots.size == 3)
  }

  test("asOf time travel resolves the newest snapshot at or before a timestamp") {
    val dir = new Path(tmpDir("lht"), "t8")
    val df1 = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df1.schema, Some("DateTime"))
    val s1 = table.append(df1)
    Thread.sleep(5)
    val s2 = table.append(mkRows(10 until 30, _ => 2020))
    assert(table.asOf(s1.timestampMs).count() == 10)
    assert(table.asOf(s2.timestampMs).count() == 30)
    assert(table.asOf(s1.timestampMs - 1).count() == 0) // before any snapshot
  }

  test("removeOrphanedFiles deletes unreferenced leftovers, keeps live data") {
    val dir = new Path(tmpDir("lht"), "t9")
    val df = mkRows(0 until 10, _ => 2020)
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    table.append(df)
    // simulate a crash leftover: a stray parquet under data/
    val fs = new Path(dir, "data").getFileSystem(spark.sessionState.newHadoopConf())
    val stray = new Path(dir, "data/DateTime_year=2020/crash-leftover.parquet")
    val out = fs.create(stray, true); out.write(1); out.close()
    val deleted = table.removeOrphanedFiles()
    assert(deleted == Seq("data/DateTime_year=2020/crash-leftover.parquet"))
    assert(!fs.exists(stray))
    assert(table.read().count() == 10) // live data untouched
    assert(table.removeOrphanedFiles().isEmpty) // idempotent
  }

  test("metadata survives reload through the catalog") {
    val wh = tmpDir("lhc")
    val cat = new LakehouseCatalog(spark, wh)
    cat.createNamespaceIfNotExists("gold")
    val df = mkRows(0 until 10, _ => 2020)
    cat.createTableIfNotExists("gold.sym", df.schema, Some("DateTime")).append(df)
    val reloaded = new LakehouseCatalog(spark, wh).loadTable("gold.sym")
    assert(reloaded.read().count() == 10)
    assert(reloaded.metadata.partitionColumns == Seq("DateTime_year"))
    assert(new LakehouseCatalog(spark, wh).listTables("gold") == Seq("gold.sym"))
  }
}
