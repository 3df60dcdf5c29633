package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Metadata-only type widening (Iceberg `update_column` promotion):
  * int→long and float→double retypes without touching data files, old
  * narrow-typed files read natively under the widened schema, and the
  * appendEvolving family absorbs the mismatch in both directions.
  */
class WidenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d")

  /** Narrow epoch: qty int32, px float32. */
  private def df32(ids: Seq[Int]) =
    ids.map(i => (ts(i), i, i.toFloat / 2f)).toDF("DateTime", "qty", "px")

  /** Wide epoch: qty int64, px float64. */
  private def df64(ids: Seq[Int]) =
    ids.map(i => (ts(i), i.toLong, i.toDouble / 2)).toDF("DateTime", "qty", "px")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("widen"), name), df32(Seq(0)).schema, Some("DateTime"))

  test("widenColumn is metadata-only and both physical epochs read under the wide type") {
    val t = fresh("basic")
    val s1 = t.append(df32(0 until 10))
    val filesBefore = t.currentDataFiles.map(_.path).toSet

    t.widenColumn("qty", LongType)
    t.widenColumn("px", DoubleType)
    assert(t.currentDataFiles.map(_.path).toSet == filesBefore,
      "widening must not move or rewrite any data file")
    assert(t.schema("qty").dataType == LongType)
    assert(t.schema("px").dataType == DoubleType)

    t.append(df64(10 until 20))
    val out = t.read()
    assert(out.schema("qty").dataType == LongType)
    assert(out.schema("px").dataType == DoubleType)
    val row = out.agg(sum("qty"), sum("px"), count(lit(1))).head()
    assert(row.getLong(0) == (0 until 20).map(_.toLong).sum)
    assert(row.getDouble(1) == (0 until 20).map(_.toDouble / 2).sum)
    assert(row.getLong(2) == 20L)

    // the pre-widening snapshot still time-travels, surfaced wide
    val old = t.timeTravel(s1.id)
    assert(old.count() == 10)
    assert(old.schema("qty").dataType == LongType)
  }

  test("narrowing and cross-family retypes are refused loudly") {
    val t = fresh("refuse")
    t.append(df32(0 until 3))
    t.widenColumn("qty", LongType)
    // narrowing back
    val e1 = intercept[IllegalArgumentException](t.widenColumn("qty", IntegerType))
    assert(e1.getMessage.contains("lossless"))
    // cross-family: int → double is NOT in the Iceberg promotion set
    val e2 = intercept[IllegalArgumentException](t.widenColumn("px", StringType))
    assert(e2.getMessage.contains("lossless"))
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    // values untouched by the refusals
    assert(t.read().agg(sum("qty")).head().getLong(0) == 3L)
  }

  test("partition identity source cannot be widened (dir layout is typed)") {
    val raw = (0 until 6).map(i => (ts(i), i % 2, i.toFloat)).toDF("DateTime", "shard", "px")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("widen"), "part"), raw.schema, Some("shard"), "identity")
    t.append(raw)
    val e = intercept[IllegalArgumentException](t.widenColumn("shard", LongType))
    assert(e.getMessage.contains("partition source"))
    // a widening batch on the same column is refused through appendEvolving too
    val wide = (6 until 8).map(i => (ts(i), (i % 2).toLong, i.toFloat))
      .toDF("DateTime", "shard", "px")
    val e2 = intercept[IllegalArgumentException](t.appendEvolving(wide))
    assert(e2.getMessage.contains("partition source"))
  }

  test("appendEvolving promotes the table when the batch is wider") {
    val t = fresh("promote")
    t.append(df32(0 until 5))
    t.appendEvolving(df64(5 until 10)) // wider batch: table widens in the same commit
    assert(t.schema("qty").dataType == LongType)
    assert(t.schema("px").dataType == DoubleType)
    val row = t.read().agg(sum("qty"), count(lit(1))).head()
    assert(row.getLong(0) == (0 until 10).map(_.toLong).sum && row.getLong(1) == 10L)
  }

  test("appendEvolving upcasts a batch the table already widened past") {
    val t = fresh("upcast")
    t.append(df32(0 until 5))
    t.widenColumn("qty", LongType)
    t.widenColumn("px", DoubleType)
    t.appendEvolving(df32(5 until 10)) // lagging narrow producer keeps working
    assert(t.schema("qty").dataType == LongType)
    val row = t.read().agg(sum("qty"), sum("px")).head()
    assert(row.getLong(0) == (0 until 10).map(_.toLong).sum)
    assert(row.getDouble(1) == (0 until 10).map(_.toDouble / 2).sum)
    // plain append stays strict but names the escape hatch
    val e = intercept[IllegalArgumentException](t.append(df32(10 until 12)))
    assert(e.getMessage.contains("widenColumn"))
  }

  test("rename then widen: historical-alias files read under the widened type") {
    val t = fresh("rnw")
    t.append(df32(0 until 5)) // physical: qty int32
    t.renameColumn("qty", "quantity")
    t.widenColumn("quantity", LongType)
    t.widenColumn("px", DoubleType)
    // new epoch: physical quantity int64
    t.append(df64(5 until 10).withColumnRenamed("qty", "quantity"))
    val out = t.read()
    assert(out.schema("quantity").dataType == LongType)
    assert(out.agg(sum("quantity")).head().getLong(0) == (0 until 10).map(_.toLong).sum)
    // and the reverse order: widen first, then rename
    val t2 = fresh("wnr")
    t2.append(df32(0 until 5))
    t2.widenColumn("qty", LongType)
    t2.widenColumn("px", DoubleType)
    t2.renameColumn("qty", "quantity")
    t2.append(df64(5 until 10).withColumnRenamed("qty", "quantity"))
    assert(t2.read().agg(sum("quantity")).head().getLong(0) ==
      (0 until 10).map(_.toLong).sum)
  }

  test("incremental reads and the change feed span a widening cleanly") {
    val t = fresh("inc")
    val s1 = t.append(df32(0 until 4))
    t.widenColumn("qty", LongType)
    t.widenColumn("px", DoubleType)
    val s2 = t.append(df64(4 until 7))
    // the delta across the widening surfaces ONLY the new rows, typed wide
    val delta = t.readIncremental(s1.id, s2.id)
    assert(delta.schema("qty").dataType == LongType)
    assert(delta.select("qty").as[Long].collect().sorted.toSeq == Seq(4L, 5L, 6L))
    // change feed across the same range: three wide-typed inserts
    val feed = t.readChangeFeed(s1.id, s2.id)
    assert(feed.schema("qty").dataType == LongType)
    val events = feed.select("_change_type", "qty").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(events == Seq(("insert", 4L), ("insert", 5L), ("insert", 6L)), events)
  }

  test("equality deletes written pre-widening still mask post-widening") {
    val t = fresh("mor")
    t.append(df32(0 until 10))
    t.morDeleteKeys(Seq(1, 3).toDF("qty"), "qty") // int32 key file
    t.widenColumn("qty", LongType)
    assert(t.read().select("qty").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 4L, 5L, 6L, 7L, 8L, 9L))
    t.morDeleteKeys(Seq(5L).toDF("qty"), "qty") // int64 key file post-widen
    assert(t.read().count() == 7)
    assert(!t.read().select("qty").as[Long].collect().contains(5L))
  }
}
