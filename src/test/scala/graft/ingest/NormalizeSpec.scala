package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("float32 columns widen to double (reference F2)") {
    val df = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 1.5f, 2.5f))
      .toDF("DateTime", "Bid", "Ask")
    val out = Normalize(df, "DateTime")
    assert(out.schema("Bid").dataType == DoubleType)
    assert(out.schema("Ask").dataType == DoubleType)
    assert(out.select($"Bid").as[Double].head() == 1.5d)
  }

  test("string time column parses via try_cast; malformed becomes null") {
    val df = Seq(("2024-01-01 00:00:01", 1.0), ("not-a-ts", 2.0)).toDF("DateTime", "Bid")
    val out = Normalize(df, "DateTime")
    assert(out.schema("DateTime").dataType == TimestampType)
    assert(out.filter($"DateTime".isNull).count() == 1)
  }

  test("epoch-nanos long time column floor-truncates to microseconds") {
    val ns = 1704067200123456789L // 2024-01-01 00:00:00.123456789
    val out = Normalize(Seq((ns, 1.0)).toDF("ts", "v"), "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == 1704067200123456L)
  }

  test("TimestampType passes through untouched; other columns keep faithful types") {
    val df = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), "keep-me", 7L))
      .toDF("DateTime", "note", "n")
    val out = Normalize(df, "DateTime")
    assert(out.schema("note").dataType == StringType) // NOT doubled (ref bug not replicated)
    assert(out.schema("n").dataType == LongType)
    assert(out.as[(Timestamp, String, Long)].head() == ((Timestamp.valueOf("2024-01-01 00:00:00"), "keep-me", 7L)))
  }
}
