package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def dayDf(day: Int, ids: Range) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-$day%02d 00:00:${i % 60}%02d.$i%06d"), i.toDouble))
      .toDF("DateTime", "Bid")

  private def usOf(s: String) = Timestamp.valueOf(s).getTime * 1000L

  test("manifest records per-file key bounds from parquet footers") {
    val dir = new Path(tmpDir("fsk"), "t")
    val df = dayDf(1, 0 until 50)
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    val snap = table.append(df)
    val f = table.addedDataFiles(snap).head
    assert(f.rows > 0)
    assert(f.minKeyUs.isDefined && f.maxKeyUs.isDefined)
    assert(f.minKeyUs.get >= usOf("2024-01-01 00:00:00"))
    assert(f.maxKeyUs.get < usOf("2024-01-02 00:00:00"))
  }

  test("readRange skips files outside the range even within one partition") {
    val dir = new Path(tmpDir("fsk"), "t2")
    val d1 = dayDf(1, 0 until 50)
    val table = LakehouseTable.createIfNotExists(spark, dir, d1.schema, Some("DateTime"))
    table.append(d1) // day 1, year 2024
    table.append(dayDf(15, 0 until 50)) // day 15, SAME year partition
    val all = table.currentDataFiles
    assert(all.size >= 2)

    val day1Files = table.filesOverlapping(usOf("2024-01-01 00:00:00"), usOf("2024-01-02 00:00:00") - 1)
    assert(day1Files.nonEmpty)
    assert(day1Files.size < all.size, "no files were skipped")
    assert(table.readRange(usOf("2024-01-01 00:00:00"), usOf("2024-01-02 00:00:00") - 1).count() == 50)
    // disjoint range: nothing read at all
    assert(table.filesOverlapping(usOf("2025-06-01 00:00:00"), usOf("2025-07-01 00:00:00")).isEmpty)
    assert(table.readRange(usOf("2025-06-01 00:00:00"), usOf("2025-07-01 00:00:00")).count() == 0)
  }

  test("dedup reads only files overlapping the batch's time range") {
    val dir = new Path(tmpDir("fsk"), "t3")
    val d1 = dayDf(1, 0 until 50)
    val table = LakehouseTable.createIfNotExists(spark, dir, d1.schema, Some("DateTime"))
    table.append(d1)
    table.append(dayDf(15, 0 until 50))
    // batch overlapping only day 15: 25 dup keys dropped, 25 new kept
    val batch = dayDf(15, 25 until 75)
    val fresh = graft.ingest.Dedup.dropExisting(batch, table, "DateTime")
    assert(fresh.count() == 25)
  }
}
