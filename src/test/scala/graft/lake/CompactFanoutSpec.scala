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

  test("fanned-out sibling files carry disjoint time-key ranges (sort-on-write)") {
    // two appends with interleaved timestamps: before compaction the
    // per-append files' ranges fully overlap; after a range-fanned
    // compaction each sibling file must own a contiguous disjoint slice,
    // otherwise filesOverlapping-based skipping degrades to
    // scan-the-whole-partition after every maintenance run
    val even = (0 until 3000 by 2).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i / 60}%02d.${i % 60}%06d"), i.toDouble))
    val odd = (1 until 3000 by 2).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i / 60}%02d.${i % 60}%06d"), i.toDouble))
    val table = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("sorted-fanout"), "t"), even.toDF("DateTime", "Bid").schema,
      Some("DateTime"))
    table.append(even.toDF("DateTime", "Bid"))
    table.append(odd.toDF("DateTime", "Bid"))

    val pre = table.dataFiles(table.metadata.currentSnapshot.get)
    assert(pre.exists(a => pre.exists(b =>
      (a ne b) && a.minKeyUs.get <= b.maxKeyUs.get && b.minKeyUs.get <= a.maxKeyUs.get)),
      "fixture should start with overlapping file ranges")

    val snap = table.compact(filesPerPartition = 4)
    val files = table.dataFiles(snap).sortBy(_.minKeyUs.get)
    assert(files.size > 1, s"got ${files.size} files")
    files.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.maxKeyUs.get < b.minKeyUs.get,
          s"overlapping sibling ranges after compaction: $a vs $b")
      case _ => ()
    }
    assert(table.read().count() === 3000L)
  }
}
