package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PredicateBoundsSpec extends SparkSpec {

  private val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
  private def us(t: java.sql.Timestamp): Long = t.getTime * 1000L

  private def bounds(c: org.apache.spark.sql.Column) = {
    // resolve against a schema-typed probe frame, same as the COW
    // discovery path (Spark 4 Columns are opaque until analysis)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("other_ts", TimestampType),
      StructField("sym", StringType)))
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val cond = probe.filter(c).queryExecution.analyzed match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(e, _) => e
      case other => fail(s"no Filter in $other")
    }
    PredicateBounds.timeBounds(cond, "ts")
  }

  test("conjunctive timestamp comparisons tighten both bounds") {
    val (lo, hi) = bounds(col("ts") >= lit(t0) && col("ts") < lit(t1) && col("sym") === "a")
    assert(lo.contains(us(t0)))
    assert(hi.contains(us(t1) - 1)) // strict < excludes the endpoint
  }

  test("reversed operand order and equality pin the range") {
    assert(bounds(lit(t0) <= col("ts")) == (Some(us(t0)), None))
    assert(bounds(col("ts") === lit(t0)) == (Some(us(t0)), Some(us(t0))))
  }

  test("anything non-extractable widens, never narrows") {
    // disjunction: neither side may tighten
    assert(bounds(col("ts") >= lit(t0) || col("sym") === "a") == (None, None))
    // a string comparison arrives as a cast — ignored
    assert(bounds(col("ts") >= lit("2024-01-10")) == (None, None))
    // an unrelated column never contributes
    assert(bounds(col("other_ts") >= lit(t0)) == (None, None))
  }

  test("delete with a time-bounded predicate stays exact under pruning") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), 3.0))
      .toDF("id", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new org.apache.hadoop.fs.Path(tmpDir("pb"), "t"), df.schema, Some("ts"), "day")
    df.collect().foreach(r => t.append(Seq(
      (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toDF("id", "ts", "v")))
    t.delete(col("ts") >= lit(t0) && col("ts") < lit(t1)) // only id=2 in range
    assert(t.read().select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
