package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class UpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(rows: Seq[(String, Long, Double)]): LakehouseTable = {
    val df = rows.toDF("sym", "ts_us", "px")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("upd"), "t"), df.schema, None)
    t
  }

  test("update rewrites matching rows and carries the rest byte-identical") {
    val t = freshTable(Nil)
    t.append(Seq(("a", 1L, 10.0), ("a", 2L, 20.0)).toDF("sym", "ts_us", "px"))
    t.append(Seq(("b", 3L, 30.0)).toDF("sym", "ts_us", "px"))
    t.update(col("sym") === "a" && col("ts_us") === 2L,
      Map("px" -> (col("px") * 2)))
    val rows = t.read().orderBy("ts_us").collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts_us"), r.getAs[Double]("px")))
    assert(rows.toSeq == Seq(("a", 1L, 10.0), ("a", 2L, 40.0), ("b", 3L, 30.0)))
  }

  test("update is file-surgical: files without matches keep their identity") {
    val t = freshTable(Nil)
    t.append(Seq(("a", 1L, 10.0)).toDF("sym", "ts_us", "px")) // file A
    t.append(Seq(("b", 2L, 20.0)).toDF("sym", "ts_us", "px")) // file B
    def filePaths =
      t.read().select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val before = filePaths
    t.update(col("sym") === "b", Map("px" -> lit(99.0)))
    val after = filePaths
    // file A survives verbatim; file B was rewritten into a new file
    assert(before.intersect(after).size == 1)
    assert(t.read().filter(col("sym") === "b").head().getAs[Double]("px") == 99.0)
  }

  test("null-predicate rows survive with original values") {
    val t = freshTable(Nil)
    val df = Seq(("a", Some(1.0)), ("b", None)).toDF("sym", "maybe")
      .withColumn("px", lit(5.0))
    val t2 = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("updn"), "t"), df.schema, None)
    t2.append(df)
    // maybe > 0 is NULL for b — b must keep px = 5.0, not get updated
    t2.update(col("maybe") > 0, Map("px" -> lit(7.0)))
    val bPx = t2.read().filter(col("sym") === "b").head().getAs[Double]("px")
    val aPx = t2.read().filter(col("sym") === "a").head().getAs[Double]("px")
    assert(aPx == 7.0 && bPx == 5.0)
  }

  test("updating the partition source migrates rows to the new layout") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("id", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("updp"), "t"), df.schema, Some("ts"), "day")
    t.append(df)
    t.update(col("id") === 1L,
      Map("ts" -> lit(java.sql.Timestamp.valueOf("2024-03-05 10:00:00"))))
    val files = t.read().select(input_file_name()).collect().map(_.getString(0))
    assert(files.forall(_.contains("ts_day=20240305")),
      s"row did not migrate partitions: ${files.toSeq}")
    // update preserves row count and time travel sees the pre-image
    assert(t.read().count() == 1)
    assert(t.timeTravel(1L).select("ts").head().getTimestamp(0)
      == java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
  }

  test("derived partition columns cannot be assigned") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("id", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("updd"), "t"), df.schema, Some("ts"), "day")
    t.append(df)
    val e = intercept[IllegalArgumentException] {
      t.update(lit(true), Map("ts_day" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown column") ||
      e.getMessage.contains("derived partition"))
  }
}
