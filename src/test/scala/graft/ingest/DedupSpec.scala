package graft.ingest

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(year: Int, i: Int) =
    Timestamp.valueOf(f"$year%04d-01-01 00:00:${i % 60}%02d.$i%06d")

  private def df(year: Int, ids: Range) =
    ids.map(i => (ts(year, i), i.toDouble)).toDF("DateTime", "Bid")

  test("empty table: batch passes through untouched") {
    val dir = new Path(tmpDir("dd"), "t")
    val batch = df(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, batch.schema, Some("DateTime"))
    assert(Dedup.dropExisting(batch, table, "DateTime").count() == 20)
  }

  test("overlapping keys are dropped, new keys kept") {
    val dir = new Path(tmpDir("dd"), "t2")
    val first = df(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    table.append(first)
    val second = df(2020, 10 until 30) // 10 overlap, 10 new
    val fresh = Dedup.dropExisting(second, table, "DateTime")
    assert(fresh.count() == 10)
    assert(fresh.as[(Timestamp, Double)].collect().map(_._2).sorted.toSeq == (20 until 30).map(_.toDouble))
  }

  test("full overlap drops everything (idempotent re-ingest)") {
    val dir = new Path(tmpDir("dd"), "t3")
    val first = df(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    table.append(first)
    assert(Dedup.dropExisting(first, table, "DateTime").count() == 0)
  }

  test("partition pruning: batch in a different year never conflicts") {
    val dir = new Path(tmpDir("dd"), "t4")
    val first = df(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, first.schema, Some("DateTime"))
    table.append(first)
    val batch2021 = df(2021, 0 until 20) // same sub-second keys, different year
    assert(Dedup.dropExisting(batch2021, table, "DateTime").count() == 20)
  }
}
