package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

class CompactFanoutSpec extends SparkSpec {
  import spark.implicits._

  test("compact(filesPerPartition > 1) fans a partition across files, content intact") {
    val rows = (0 until 3000).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i / 60}%02d.${i % 60}%06d"), i.toDouble))
    val df = rows.toDF("DateTime", "Bid")
    val table = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("fanout"), "t"), df.schema, Some("DateTime"))
    table.append(df)

    val snap = table.compact(filesPerPartition = 4)
    val files = table.dataFiles(snap)
    // single year partition: more than one file, at most the fan-out
    assert(files.size > 1 && files.size <= 4, s"got ${files.size} files")
    assert(table.read().count() === 3000L)
    assert(files.map(_.rows).sum === 3000L)
  }
}
