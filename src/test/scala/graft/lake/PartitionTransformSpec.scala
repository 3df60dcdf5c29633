package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Partition transforms beyond year (VERDICT r4 #1): the reference
  * hardcodes `YearTransform()` (`lakehouse_pipeline.py:373-382`); at
  * 100 TB of tick data a year directory is terabytes, so day/hour
  * granularity — and identity for low-cardinality columns — is what
  * partition pruning actually needs.
  */
class PartitionTransformSpec extends SparkSpec {
  import spark.implicits._

  private def mkDays(rowsPerDay: Int, days: Seq[Int]) =
    days.flatMap(d => (0 until rowsPerDay).map(i =>
      (Timestamp.valueOf(f"2020-01-$d%02d 0${i % 10}:00:${i % 60}%02d.$i%06d"), i.toDouble, i.toLong)))
      .toDF("DateTime", "Bid", "id")

  private def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans)
  }

  test("day granularity derives yyyymmdd ints, writes day dirs, reads back") {
    val dir = new Path(tmpDir("ptx"), "day")
    val df = mkDays(20, Seq(3, 4, 5))
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"), "day")
    table.append(df)
    val back = table.read()
    assert(back.count() == 60)
    assert(back.select("DateTime_day").distinct().as[Int].collect().sorted.toSeq ==
      Seq(20200103, 20200104, 20200105))
    // partition dirs are hive-style at day granularity
    assert(table.currentDataFiles.forall(_.path.contains("DateTime_day=202001")))
    // the derived value always agrees with the recomputed formula
    val recomputed = (year($"DateTime") * 100 + month($"DateTime")) * 100 + dayofmonth($"DateTime")
    assert(back.filter($"DateTime_day" =!= recomputed).count() == 0)
  }

  test("month and hour derivations match their formulas") {
    for ((gran, expr) <- Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      "month" -> (ts => year(ts) * 100 + month(ts)),
      "hour" -> (ts => ((year(ts) * 100 + month(ts)) * 100 + dayofmonth(ts)) * 100 + hour(ts)))) {
      val dir = new Path(tmpDir("ptx"), gran)
      val df = mkDays(6, Seq(7, 8))
      val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"), gran)
      table.append(df)
      val back = table.read()
      val pc = s"DateTime_$gran"
      assert(back.columns.contains(pc), gran)
      assert(back.filter(col(pc) =!= expr($"DateTime")).count() == 0, gran)
    }
  }

  test("day-partition pruning: a one-day filter scans only that day's files") {
    val dir = new Path(tmpDir("ptx"), "prune")
    val df = mkDays(20, Seq(10, 11, 12, 13, 14))
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"), "day")
    table.append(df)
    val totalFiles = table.currentDataFiles.size
    val dayFiles = table.currentDataFiles.count(_.path.contains("DateTime_day=20200112"))
    assert(totalFiles > dayFiles, "fixture must span multiple day partitions")

    val q = table.read().filter($"DateTime_day" === 20200112)
    // collect() drives q's OWN queryExecution (count() would build a
    // separate one, leaving these metrics untouched)
    assert(q.collect().length == 20)
    val scans = fileScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // Catalyst partition pruning over the hive-style day dirs: the scan
    // plans exactly the matching day's files, not the table
    assert(scans.map(_.metrics("numFiles").value).sum == dayFiles,
      s"expected $dayFiles files scanned of $totalFiles")
  }

  test("identity granularity partitions on a real data column and round-trips") {
    val dir = new Path(tmpDir("ptx"), "ident")
    val df = Seq(
      ("AAA", Timestamp.valueOf("2020-01-01 00:00:00"), 1.0),
      ("AAA", Timestamp.valueOf("2020-01-02 00:00:00"), 2.0),
      ("BBB", Timestamp.valueOf("2020-01-03 00:00:00"), 3.0))
      .toDF("sym", "DateTime", "Bid")
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("sym"), "identity")
    table.append(df)
    val back = table.read()
    assert(back.count() == 3)
    // the identity column is a REAL data column: still typed, still
    // queryable, recovered from the partition dirs
    assert(back.filter($"sym" === "AAA").count() == 2)
    assert(table.currentDataFiles.exists(_.path.contains("sym=AAA")))
    // append without the identity column must fail schema validation
    val missing = intercept[IllegalArgumentException] {
      table.append(df.drop("sym"))
    }
    assert(missing.getMessage.contains("sym"))
    // COW delete must not drop the identity column from survivors
    table.delete($"Bid" === 2.0)
    val after = table.read()
    assert(after.count() == 2)
    assert(after.select("sym").as[String].collect().sorted.toSeq == Seq("AAA", "BBB"))
  }

  test("year remains the default and pre-granularity metadata reads as year") {
    val dir = new Path(tmpDir("ptx"), "default")
    val df = mkDays(5, Seq(1))
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("DateTime"))
    assert(table.metadata.granularity == "year")
    table.append(df)
    assert(table.read().columns.contains("DateTime_year"))
  }
}
