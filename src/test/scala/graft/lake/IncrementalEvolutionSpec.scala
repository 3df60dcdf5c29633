package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Incremental / change-feed reads across a mid-range schema evolution:
  * files written before an ADD COLUMN lack it and must surface nulls,
  * not break the union.
  */
class IncrementalEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  test("readIncremental spans an ADD COLUMN commit") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("inc-evo"), "t"), df(Seq(0)).schema, Some("DateTime"))
    t.append(df(0 until 3))
    val from = t.metadata.currentSnapshotId.get
    t.append(df(3 until 5)) // pre-evolution delta files
    t.addColumn("Venue", org.apache.spark.sql.types.StringType)
    t.append(df(5 until 7).withColumn("Venue", lit("X")))
    val delta = t.readIncremental(from, t.metadata.currentSnapshotId.get)
    val got = delta.select("EventId", "Venue").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(3L -> None, 4L -> None, 5L -> Some("X"), 6L -> Some("X")),
      s"pre-evolution files must surface null for the new column, got $got")
  }

  test("change feed spans an ADD COLUMN commit") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("cdf-evo"), "t"), df(Seq(0)).schema, Some("DateTime"))
    t.append(df(0 until 3))
    val from = t.metadata.currentSnapshotId.get
    t.addColumn("Venue", org.apache.spark.sql.types.StringType)
    t.append(df(3 until 5).withColumn("Venue", lit("X")))
    t.morDeleteKeys(Seq(1L).toDF("EventId"), "EventId") // pre-image lacks Venue
    val cdf = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)
    val byType = cdf.select("EventId", "_change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byType == Map(3L -> "insert", 4L -> "insert", 1L -> "delete"), s"got $byType")
  }
}
