package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(year: Int, ids: Range) =
    ids.map(i => (Timestamp.valueOf(f"$year%d-01-01 00:00:$i%02d"), i.toDouble))
      .toDF("DateTime", "Bid")

  test("merge rewrites only the files containing matched keys") {
    val dir = new Path(tmpDir("merge"), "t")
    val y2020 = rows(2020, 0 until 50)
    val table = LakehouseTable.createIfNotExists(spark, dir, y2020.schema, Some("DateTime"))
    table.append(y2020)
    table.append(rows(2021, 0 until 40))
    val before = table.currentDataFiles
    val untouched = before.filter(_.path.contains("DateTime_year=2021"))
    assert(untouched.nonEmpty)

    // update 10 keys in 2020 (+1000) and insert 5 brand-new 2020 keys
    val updates = rows(2020, 0 until 10).withColumn("Bid", col("Bid") + 1000.0)
      .unionByName(
        (100 until 105).map(i => (Timestamp.valueOf(f"2020-01-01 00:01:${i - 100}%02d"), i.toDouble))
          .toDF("DateTime", "Bid"))
    val preMergeSnap = table.metadata.currentSnapshot.get.id
    table.merge(updates, "DateTime")

    val after = table.metadata.currentSnapshot.get
    val afterFiles = table.dataFiles(after)
    // 2021 files carried over byte-identical (same manifest entries)
    untouched.foreach(f => assert(afterFiles.exists(_.path == f.path)))
    // only the 2020 files CONTAINING matched keys were replaced; 2020
    // files holding untouched keys survive (that's the surgical point)
    val before2020 = before.filter(_.path.contains("DateTime_year=2020"))
    val survived2020 = before2020.count(f => afterFiles.exists(_.path == f.path))
    assert(survived2020 < before2020.size, "no 2020 file was rewritten")

    val df = table.read()
    assert(df.count() === 95L) // 50 + 40 + 5 inserts
    assert(after.totalRows === 95L)
    assert(df.filter($"Bid" >= 1000.0).count() === 10L) // updates applied
    assert(df.filter($"DateTime" === Timestamp.valueOf("2020-01-01 00:00:05"))
      .select("Bid").as[Double].head() === 1005.0)

    // time travel still sees pre-merge values
    val old = table.timeTravel(preMergeSnap)
    assert(old.count() === 90L)
    assert(old.filter($"Bid" >= 1000.0).count() === 0L)
  }

  test("delete rewrites only files containing matches; time travel keeps old data") {
    val dir = new Path(tmpDir("merge"), "t3")
    val y2020 = rows(2020, 0 until 30)
    val table = LakehouseTable.createIfNotExists(spark, dir, y2020.schema, Some("DateTime"))
    table.append(y2020)
    table.append(rows(2021, 0 until 30))
    val before = table.metadata.currentSnapshot.get
    val files2021 = table.dataFiles(before).filter(_.path.contains("DateTime_year=2021"))

    table.delete(year($"DateTime") === 2020 && $"Bid" < 10.0)

    val after = table.metadata.currentSnapshot.get
    val afterFiles = table.dataFiles(after)
    files2021.foreach(f => assert(afterFiles.exists(_.path == f.path))) // untouched
    assert(table.read().count() === 50L) // 30 - 10 + 30
    assert(after.totalRows === 50L)
    assert(table.read().filter(year($"DateTime") === 2020 && $"Bid" < 10.0).count() === 0L)
    assert(table.timeTravel(before.id).count() === 60L) // pre-delete intact
  }

  test("merge into an empty table is a plain insert") {
    val dir = new Path(tmpDir("merge"), "t2")
    val data = rows(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, data.schema, Some("DateTime"))
    table.merge(data, "DateTime")
    assert(table.read().count() === 20L)
    assert(table.snapshots.head.operation === "merge")
  }
}
