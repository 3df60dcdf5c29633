package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Positional MoR deletes: [[LakehouseTable.morDeleteWhere]] masks
  * exactly the predicate-selected rows by (file, position) with zero
  * data files rewritten; positions bind to files (later appends with
  * matching rows are live), compose with equality deletes, fold under
  * compaction, and survive time travel.
  */
class PositionalDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("pos"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(t: LakehouseTable): Set[Long] =
    t.read().select("EventId").collect().map(_.getLong(0)).toSet

  test("predicate delete masks matching rows without touching data files") {
    val t = fresh("basic")
    t.append(df(0 until 10))
    t.append(df(10 until 20))
    val filesBefore = t.currentDataFiles.map(_.path).toSet

    t.morDeleteWhere(col("EventId") % 4 === 1 && col("Bid") < 10.0) // 1, 5, 9

    assert(ids(t) == (0 until 20).map(_.toLong).toSet -- Set(1L, 5L, 9L))
    assert(t.currentDataFiles.map(_.path).toSet == filesBefore,
      "positional delete must not rewrite or drop data files")
    assert(t.currentDeleteFiles.size == 1)
    assert(t.currentDeleteFiles.head.isPositional)
    assert(t.currentDeleteFiles.head.rows == 3)
  }

  test("positions bind to files: a matching row appended later is live") {
    val t = fresh("bind")
    t.append(df(0 until 6))
    t.morDeleteWhere(col("EventId") === 2L)
    assert(!ids(t).contains(2L))
    t.append(df(Seq(2))) // same logical row, new file
    assert(ids(t).contains(2L), "positional masks never reach new files")
    assert(t.read().count() == 6)
  }

  test("already-masked rows are not re-selected; predicates compose with equality deletes") {
    val t = fresh("compose")
    t.append(df(0 until 10))
    t.morDeleteKeys(df(Seq(3)).select("EventId"), "EventId")
    t.morDeleteWhere(col("Bid") < 5.0) // 0,1,2,4 (3 already masked)
    assert(t.currentDeleteFiles.count(_.isPositional) == 1)
    assert(t.currentDeleteFiles.find(_.isPositional).get.rows == 4,
      "the equality-masked row must not be re-selected")
    assert(ids(t) == Set(5L, 6L, 7L, 8L, 9L))
  }

  test("NULL-predicate rows survive (SQL DELETE semantics)") {
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, Some(1.0)),
      (Timestamp.valueOf("2024-01-01 00:00:01"), 2L, None),
      (Timestamp.valueOf("2024-01-01 00:00:02"), 3L, Some(3.0)))
      .toDF("DateTime", "EventId", "Bid")
    val t2 = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("pos"), "nulltab"), rows.schema, Some("DateTime"))
    t2.append(rows)
    t2.morDeleteWhere(col("Bid") < 2.0) // NULL Bid → predicate NULL → survives
    assert(t2.read().select("EventId").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("compaction folds positional deletes; time travel sees pre-delete rows") {
    val t = fresh("fold")
    t.append(df(0 until 8))
    val preDelete = t.metadata.currentSnapshot.get.id
    t.morDeleteWhere(col("EventId").isin(1L, 4L))
    assert(t.timeTravel(preDelete).count() == 8)
    t.compact()
    assert(t.currentDeleteFiles.isEmpty, "compaction must clear positional masks")
    assert(ids(t) == (0 until 8).map(_.toLong).toSet -- Set(1L, 4L))
    assert(t.read().count() == 6)
  }

  test("COW merge over pending positional deletes does not resurrect masked rows") {
    val t = fresh("cow")
    t.append(df(0 until 10))
    t.morDeleteWhere(col("EventId") === 6L)
    val updates = df(Seq(7)).withColumn("Bid", lit(700.0))
    t.merge(updates, "DateTime")
    assert(ids(t) == (0 until 10).map(_.toLong).toSet - 6L)
    assert(t.read().filter(col("EventId") === 7L).head().getDouble(2) == 700.0)
  }

  test("a predicate matching nothing is a no-op commit") {
    val t = fresh("noop")
    t.append(df(0 until 4))
    val before = t.metadata.currentSnapshot.get.id
    t.morDeleteWhere(col("EventId") === 99L)
    assert(t.metadata.currentSnapshot.get.id == before)
    assert(t.read().count() == 4)
  }
}
