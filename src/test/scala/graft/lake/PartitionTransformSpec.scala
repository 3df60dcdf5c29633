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

  test("bucket[N] hashes a high-cardinality key into N dirs; equality read prunes to its bucket") {
    val dir = new Path(tmpDir("ptx"), "bucket")
    val syms = (0 until 40).map(i => f"SYM$i%03d")
    val df = syms.flatMap(s => (0 until 5).map(i =>
      (s, Timestamp.valueOf(f"2020-01-01 00:00:${i % 60}%02d.$i%06d"), i.toDouble)))
      .toDF("sym", "DateTime", "Bid")
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("sym"), "bucket[8]")
    table.append(df)
    val back = table.read()
    assert(back.count() == 200)
    // derived bucket agrees with the published stable-hash formula
    val recomputed = pmod(xxhash64($"sym"), lit(8)).cast("int")
    assert(back.filter($"sym_bucket" =!= recomputed).count() == 0)
    // 40 symbols over 8 buckets: dirs bounded by N, not by cardinality
    val bucketDirs = table.currentDataFiles
      .map(_.path.split("/").find(_.startsWith("sym_bucket=")).getOrElse(""))
      .distinct
    assert(bucketDirs.nonEmpty && bucketDirs.size <= 8, s"got dirs: $bucketDirs")

    // equality-key read plans ONLY the key's bucket dir
    val q = table.readKeyIn(Seq("SYM007"))
    assert(q.collect().length == 5)
    val scans = fileScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val totalFiles = table.currentDataFiles.size
    val prunedFiles = scans.map(_.metrics("numFiles").value).sum
    assert(prunedFiles < totalFiles,
      s"expected bucket pruning: scanned $prunedFiles of $totalFiles files")
    // non-bucket tables reject the bucket read path loudly
    val notBucket = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("ptx"), "nb"), df.schema, Some("sym"), "identity")
    notBucket.append(df)
    val e = intercept[IllegalArgumentException](notBucket.readKeyIn(Seq("SYM001")))
    assert(e.getMessage.contains("bucket"))
  }

  test("bucket table round-trips merge and compaction on the non-time key") {
    val dir = new Path(tmpDir("ptx"), "bucket-merge")
    val df = (0 until 30).map(i =>
      (f"K$i%03d", Timestamp.valueOf(f"2020-01-01 00:00:${i % 60}%02d"), i.toDouble))
      .toDF("sym", "DateTime", "Bid")
    val table = LakehouseTable.createIfNotExists(spark, dir, df.schema, Some("sym"), "bucket[4]")
    table.append(df)
    // upsert 5 existing keys + 2 new ones on the STRING source column —
    // must take the whole-manifest path (no epoch-micros narrowing)
    val upsert = (Seq(3, 7, 11, 15, 19).map(i =>
      (f"K$i%03d", Timestamp.valueOf("2020-01-02 00:00:00"), 99.0)) ++
      Seq(("KNEW1", Timestamp.valueOf("2020-01-02 00:00:01"), 1.0),
        ("KNEW2", Timestamp.valueOf("2020-01-02 00:00:02"), 2.0)))
      .toDF("sym", "DateTime", "Bid")
    table.merge(upsert, "sym")
    val after = table.read()
    assert(after.count() == 32)
    assert(after.filter($"Bid" === 99.0).count() == 5)
    assert(after.filter($"sym" === "K003").select("Bid").head().getDouble(0) == 99.0)
    // compaction keeps bucket dirs and content intact (no time key to
    // sort by on a non-time source — hash fan-out path)
    table.compact()
    assert(table.read().count() == 32)
    assert(table.readKeyIn(Seq("KNEW1", "K007")).count() == 2)
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
