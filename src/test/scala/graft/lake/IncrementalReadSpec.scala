package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Incremental append-scans ([[LakehouseTable.readIncremental]]): the
  * delta between two snapshots must contain exactly the rows added in
  * between, skip row-moving maintenance commits, refuse row-removing
  * commits (append-scan contract), and stream upsert row images only
  * when explicitly asked.
  */
class IncrementalReadSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("incr"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("EventId").collect().map(_.getLong(0)).toSet

  test("delta between snapshots is exactly the rows appended in between") {
    val t = fresh("basic")
    val s1 = t.append(df(0 until 5))
    val s2 = t.append(df(5 until 8))
    val s3 = t.append(df(8 until 10))
    assert(ids(t.readIncremental(s1.id, s3.id)) == (5L until 10L).toSet)
    assert(ids(t.readIncremental(s2.id, s3.id)) == (8L until 10L).toSet)
    assert(t.readIncremental(s3.id, s3.id).count() == 0, "from == to is empty")
    assert(ids(t.readIncremental(s1.id)) == (5L until 10L).toSet, "to defaults to current")
  }

  test("compaction and manifest folds inside the range are skipped") {
    val t = fresh("maint")
    val s1 = t.append(df(0 until 5))
    t.append(df(5 until 8))
    t.compact()
    t.rewriteManifests()
    t.append(df(8 until 10))
    assert(ids(t.readIncremental(s1.id)) == (5L until 10L).toSet,
      "maintenance commits move rows but add none")
  }

  test("row-removing commits refuse the append-scan") {
    val t = fresh("cow")
    val s1 = t.append(df(0 until 6))
    t.delete(col("EventId") === 2L)
    val e = intercept[UnsupportedOperationException](t.readIncremental(s1.id))
    assert(e.getMessage.contains("removed or rewrote"))

    val t2 = fresh("mor")
    val m1 = t2.append(df(0 until 6))
    t2.morDeleteKeys(df(Seq(1)).select("EventId"), "EventId")
    intercept[UnsupportedOperationException](t2.readIncremental(m1.id))
    intercept[UnsupportedOperationException](
      t2.readIncremental(m1.id, t2.metadata.currentSnapshotId.get, emitUpserts = true))
  }

  test("MoR upserts stream row images only with emitUpserts") {
    val t = fresh("upsert")
    val s1 = t.append(df(0 until 6))
    t.morMerge(df(Seq(2, 3)).withColumn("Bid", col("Bid") + 100.0), "DateTime")
    val strict = intercept[UnsupportedOperationException](t.readIncremental(s1.id))
    assert(strict.getMessage.contains("emitUpserts"))
    val images = t.readIncremental(s1.id, t.metadata.currentSnapshotId.get, emitUpserts = true)
    assert(ids(images) == Set(2L, 3L))
    assert(images.select("Bid").collect().map(_.getDouble(0)).toSet == Set(102.0, 103.0))
  }

  test("emitUpserts stamps _commit_seq so conflicting images order (ADVICE r6)") {
    val t = fresh("seqstamp")
    val s1 = t.append(df(0 until 4))
    // two upserts of the SAME key in one range: without a sequence
    // column the two row images are indistinguishable and a by-key
    // consumer can persist the stale one
    t.morMerge(df(Seq(2)).withColumn("Bid", lit(100.0)), "DateTime")
    t.morMerge(df(Seq(2)).withColumn("Bid", lit(200.0)), "DateTime")
    val images = t.readIncremental(s1.id, t.metadata.currentSnapshotId.get, emitUpserts = true)
    assert(images.columns.contains("_commit_seq"))
    val byKey = images.filter(col("EventId") === 2L)
      .select("_commit_seq", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byKey.size == 2, "both images must be emitted")
    // keep-max-seq resolves to the LATEST image
    assert(byKey(byKey.keySet.max) == 200.0)
    assert(byKey(byKey.keySet.min) == 100.0)
  }

  test("an expired from-snapshot fails instead of returning a wrong delta") {
    val t = fresh("expired")
    val s1 = t.append(df(Seq(0)))
    t.append(df(Seq(1)))
    t.append(df(Seq(2)))
    t.append(df(Seq(3)))
    t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    val e = intercept[IllegalArgumentException](t.readIncremental(s1.id))
    assert(e.getMessage.contains("not found"))
  }
}
