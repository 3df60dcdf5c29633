package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Merge-on-read equality deletes: [[LakehouseTable.morDeleteKeys]] and
  * [[LakehouseTable.morMerge]] must mask rows WITHOUT rewriting any data
  * file, honor sequence numbers (later appends with a deleted key are
  * live), survive time travel, fold away under compaction, and have
  * their key files reaped by expiry once unreferenced.
  */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("mor"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(t: LakehouseTable): Set[Long] =
    t.read().select("EventId").collect().map(_.getLong(0)).toSet

  test("morDeleteKeys masks rows without touching any data file") {
    val t = fresh("basic")
    t.append(df(0 until 20))
    val filesBefore = t.currentDataFiles.map(_.path).toSet

    t.morDeleteKeys(df(Seq(3, 7, 11)).select("EventId"), "EventId")

    assert(ids(t) == (0 until 20).map(_.toLong).toSet -- Set(3L, 7L, 11L))
    assert(t.currentDataFiles.map(_.path).toSet == filesBefore,
      "MoR delete must not rewrite or drop data files")
    assert(t.currentDeleteFiles.size == 1)
    assert(t.currentDeleteFiles.head.rows == 3)
    assert(t.metadata.currentSnapshot.get.operation == "mor-delete")
  }

  test("sequence gate: a row re-appended after the delete is live") {
    val t = fresh("seq")
    t.append(df(0 until 10))
    t.morDeleteKeys(df(Seq(4)).select("EventId"), "EventId")
    assert(!ids(t).contains(4L))
    t.append(df(Seq(4))) // same key, newer sequence than the delete
    assert(ids(t).contains(4L), "append after delete must not be masked")
    assert(t.read().count() == 10)
  }

  test("morMerge upserts without rewriting existing files") {
    val t = fresh("merge")
    t.append(df(0 until 10))
    val filesBefore = t.currentDataFiles.map(_.path).toSet

    val updates = df(Seq(2, 5)).withColumn("Bid", col("Bid") + 100.0)
    t.morMerge(updates, "DateTime")

    val got = t.read().select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 10, "upsert must not change row count")
    assert(got(2L) == 102.0 && got(5L) == 105.0, "updated values must win")
    assert(got(3L) == 3.0, "untouched rows keep their values")
    assert(filesBefore.subsetOf(t.currentDataFiles.map(_.path).toSet),
      "MoR merge must keep existing data files in place")
    assert(t.metadata.currentSnapshot.get.operation == "mor-merge")
  }

  test("read-side anti-join broadcasts the delete-key side (plan-asserted)") {
    val t = fresh("bcast")
    t.append(df(0 until 20))
    t.morDeleteKeys(df(Seq(3, 7)).select("EventId"), "EventId")
    val read = t.read()
    read.count() // finalize the adaptive plan before inspecting it
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a BroadcastHashJoin LeftAnti for the delete mask, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "delete mask must never fall back to sort-merge")
  }

  test("time travel to the pre-delete snapshot sees the masked rows") {
    val t = fresh("tt")
    t.append(df(0 until 8))
    val preDelete = t.metadata.currentSnapshot.get.id
    t.morDeleteKeys(df(Seq(1, 2)).select("EventId"), "EventId")
    assert(t.timeTravel(preDelete).count() == 8)
    assert(t.read().count() == 6)
  }

  test("readRange applies pending deletes (the ingest-dedup read path)") {
    val t = fresh("range")
    t.append(df(0 until 10))
    t.morDeleteKeys(df(Seq(6)).select("EventId"), "EventId")
    val all = t.readRange(Long.MinValue, Long.MaxValue)
      .select("EventId").collect().map(_.getLong(0)).toSet
    assert(!all.contains(6L), "a pruned range read must not resurrect deleted rows")
  }

  test("compaction folds deletes: set cleared, rows unchanged, totalRows exact") {
    val t = fresh("fold")
    t.append(df(0 until 12))
    t.morDeleteKeys(df(Seq(0, 6)).select("EventId"), "EventId")
    val updates = df(Seq(3)).withColumn("Bid", lit(999.0))
    t.morMerge(updates, "DateTime")
    val before = t.read().select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    t.compact()

    assert(t.currentDeleteFiles.isEmpty, "compaction must clear the delete set")
    val after = t.read().select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == before, "compaction must not change query results")
    assert(t.metadata.currentSnapshot.get.totalRows == before.size.toLong,
      "post-fold totalRows must equal live rows")
  }

  test("expiry reaps delete files once no retained snapshot references them") {
    val t = fresh("expire")
    val fs = t.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    t.append(df(0 until 10))
    t.morDeleteKeys(df(Seq(1)).select("EventId"), "EventId")
    val delPath = new Path(t.tableDir, t.currentDeleteFiles.head.path)
    t.compact() // clears deletes from the live set
    t.append(df(Seq(20)))
    t.append(df(Seq(21)))
    assert(fs.exists(delPath), "pre-expiry: old snapshots still reference the key file")

    val (expired, deleted) = t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    assert(expired.nonEmpty)
    assert(!fs.exists(delPath), "expiry must reap the unreferenced delete file")
    assert(deleted.exists(_.startsWith("deletes/")))
    assert(t.read().count() == 11)
  }

  test("COW delete over pending MoR deletes does not resurrect masked rows") {
    val t = fresh("cow")
    t.append(df(0 until 10))
    t.morDeleteKeys(df(Seq(2)).select("EventId"), "EventId")
    // COW-delete a row living in the same files the MoR delete masks
    t.delete(col("EventId") === 5L)
    assert(ids(t) == (0 until 10).map(_.toLong).toSet -- Set(2L, 5L))
    // and the rewritten survivors are beyond the old delete's sequence
    assert(t.read().count() == 8)
  }

  test("composite-key delete masks only full-tuple matches") {
    val t = fresh("comp")
    // EventId repeats across two Bid groups: (EventId, Bid) is the key
    val rows = (0 until 10).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), (i % 5).toLong, (i / 5).toDouble))
      .toDF("DateTime", "EventId", "Bid")
    t.append(rows)
    t.morDeleteKeys(
      Seq((2L, 0.0), (3L, 1.0)).toDF("EventId", "Bid"), Seq("EventId", "Bid"))
    val left = t.read().select("EventId", "Bid").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(left.size == 8, "exactly the two full tuples are masked")
    assert(!left.contains((2L, 0.0)) && !left.contains((3L, 1.0)))
    assert(left.contains((2L, 1.0)) && left.contains((3L, 0.0)),
      "partial matches (one component only) must survive")
    assert(t.currentDeleteFiles.head.keyCols == Seq("EventId", "Bid"))
  }

  test("composite-key morMerge upserts by full tuple and folds under compaction") {
    val t = fresh("compmerge")
    val rows = (0 until 8).map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), (i % 4).toLong, (i / 4).toDouble))
      .toDF("DateTime", "EventId", "Bid")
    t.append(rows)
    // upsert keyed on (EventId, Bid): replaces exactly the (1, 0.0) row
    val batch = Seq((Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 0.0))
      .toDF("DateTime", "EventId", "Bid")
    t.morMerge(batch, Seq("EventId", "Bid"))
    assert(t.read().count() == 8)
    assert(t.read().filter(col("EventId") === 1L && col("Bid") === 0.0)
      .select("DateTime").head().getTimestamp(0) ==
      Timestamp.valueOf("2024-01-02 00:00:00"), "the new image wins")
    assert(t.read().filter(col("EventId") === 1L && col("Bid") === 1.0).count() == 1,
      "same EventId under the other Bid is untouched")
    t.compact()
    assert(t.currentDeleteFiles.isEmpty)
    assert(t.read().count() == 8)
  }

  test("null in any composite component never matches") {
    val t = fresh("compnull")
    t.append(df(0 until 5))
    val before = t.metadata.currentSnapshot.get.id
    t.morDeleteKeys(
      Seq((Option.empty[Long], 2.0)).toDF("EventId", "Bid"),
      Seq("EventId", "Bid"))
    assert(t.metadata.currentSnapshot.get.id == before, "all-null-component tuple: no-op")
    assert(t.read().count() == 5)
  }

  test("morMerge into an empty table degrades to a plain append") {
    val t = fresh("empty")
    t.morMerge(df(0 until 5), "DateTime")
    assert(t.read().count() == 5)
    assert(t.currentDeleteFiles.isEmpty)
  }

  test("all-null delete keys are a no-op commit") {
    val t = fresh("nulls")
    t.append(df(0 until 5))
    val snapBefore = t.metadata.currentSnapshot.get.id
    t.morDeleteKeys(
      df(Seq(1)).select(lit(null).cast("bigint").as("EventId")), "EventId")
    assert(t.metadata.currentSnapshot.get.id == snapBefore, "no new snapshot")
    assert(t.read().count() == 5)
  }

  test("delete key must be a schema column") {
    val t = fresh("badkey")
    t.append(df(0 until 3))
    val e = intercept[IllegalArgumentException] {
      t.morDeleteKeys(df(Seq(1)).select(col("EventId").as("nope")), "nope")
    }
    assert(e.getMessage.contains("not a column"))
  }
}
