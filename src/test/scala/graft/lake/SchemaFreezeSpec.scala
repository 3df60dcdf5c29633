package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The table schema is frozen at creation (reference §1.3): a divergent
  * batch must be REJECTED, not silently written as incompatible parquet
  * the fixed read schema would misread.
  */
class SchemaFreezeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
    .toDF("DateTime", "Bid")

  private def freshTable(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("freeze"), name), base.schema, Some("DateTime"))

  test("appending a batch with an extra column fails") {
    val t = freshTable("extra")
    t.append(base)
    val e = intercept[IllegalArgumentException] {
      t.append(base.withColumn("Ask", lit(2.0)))
    }
    assert(e.getMessage.contains("unexpected: Ask"))
    assert(t.read().count() === 1L) // the bad append committed nothing
  }

  test("appending a batch with a retyped column fails") {
    val t = freshTable("retyped")
    val e = intercept[IllegalArgumentException] {
      t.append(base.withColumn("Bid", col("Bid").cast("string")))
    }
    assert(e.getMessage.contains("retyped: Bid"))
  }

  test("appending a batch with a missing column fails") {
    val t = freshTable("missing")
    val e = intercept[IllegalArgumentException] { t.append(base.drop("Bid")) }
    assert(e.getMessage.contains("missing: Bid"))
  }

  test("a pre-derived partition column is allowed") {
    val t = freshTable("derived")
    t.append(base.withColumn("DateTime_year", year(col("DateTime"))))
    assert(t.read().count() === 1L)
  }
}
