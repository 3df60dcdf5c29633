package graft.ingest

import graft.SparkSpec

import java.sql.Timestamp

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = QcConfig(
    requiredColumns = Seq("DateTime", "Bid", "Ask"),
    timeColumn = "DateTime",
    positiveColumns = Seq("Bid", "Ask"),
    minRows = 10L,
    maxNullFraction = 0.05)

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.$i%06d")

  private def goodDf(n: Int) =
    (0 until n).map(i => (ts(i), 1.0 + i, 2.0 + i)).toDF("DateTime", "Bid", "Ask")

  test("Q1 pass / fail on row threshold") {
    assert(QualityChecks.run(goodDf(10), cfg).passed)
    val r = QualityChecks.run(goodDf(9), cfg)
    assert(!r.passed && r.issues.exists(_.contains("Insufficient rows")))
  }

  test("Q2 missing required column fails without running a job") {
    val df = goodDf(10).drop("Ask")
    val r = QualityChecks.run(df, cfg)
    assert(!r.passed && r.issues.exists(_.contains("Missing required columns: Ask")))
  }

  test("Q3 null fraction: at 5% passes, above 5% fails") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("DateTime", org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("Bid", org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("Ask", org.apache.spark.sql.types.DoubleType, nullable = true)))
    val rows = (0 until 95).map(i => org.apache.spark.sql.Row(ts(i), java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(1.0))) ++
      (95 until 100).map(i => org.apache.spark.sql.Row(ts(i), null, java.lang.Double.valueOf(1.0)))
    val df5 = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    assert(QualityChecks.run(df5, cfg).passed) // exactly 5% — allowed
    val rows6 = (0 until 94).map(i => org.apache.spark.sql.Row(ts(i), java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(1.0))) ++
      (94 until 100).map(i => org.apache.spark.sql.Row(ts(i), null, java.lang.Double.valueOf(1.0)))
    val df6 = spark.createDataFrame(spark.sparkContext.parallelize(rows6), schema)
    val r = QualityChecks.run(df6, cfg)
    assert(!r.passed && r.issues.exists(_.contains("nulls")))
  }

  test("Q4 unparseable time column fails") {
    val df = (0 until 10).map(i => ("not-a-ts", 1.0, 1.0)).toDF("DateTime", "Bid", "Ask")
    val r = QualityChecks.run(df, cfg)
    assert(!r.passed && r.issues.exists(_.contains("no parseable timestamps")))
  }

  test("Q5 non-positive Bid/Ask fails") {
    val df = (0 until 10).map(i => (ts(i), if (i == 3) -1.0 else 1.0, 2.0)).toDF("DateTime", "Bid", "Ask")
    val r = QualityChecks.run(df, cfg)
    assert(!r.passed && r.issues.exists(_.contains("non-positive")))
  }

  test("all rules evaluated in one pass on a passing frame") {
    val r = QualityChecks.run(goodDf(50), cfg)
    assert(r.passed && r.issues.isEmpty && r.nRows == 50)
  }
}
