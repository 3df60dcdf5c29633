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

  test("appendEvolving adopts new nullable columns; old rows read as null") {
    val t = freshTable("evolve")
    t.append(base)
    t.appendEvolving(
      Seq((Timestamp.valueOf("2024-01-02 00:00:00"), 2.0, "nyse"))
        .toDF("DateTime", "Bid", "venue"))
    val out = t.read()
    assert(out.columns.contains("venue"))
    assert(out.count() === 2L)
    assert(out.filter(col("venue").isNull).count() === 1L) // pre-evolution row
    assert(out.filter(col("venue") === "nyse").count() === 1L)
    // evolution is persisted: a reloaded handle sees the widened schema
    val reloaded = LakehouseTable.load(spark, t.tableDir)
    assert(reloaded.schema.fieldNames.contains("venue"))
    // and the frozen-schema rules still apply to the widened schema
    intercept[IllegalArgumentException] { t.append(base) } // venue now required
  }

  test("appendEvolving still rejects retyped columns") {
    val t = freshTable("evolve2")
    t.append(base)
    val e = intercept[IllegalArgumentException] {
      t.appendEvolving(base.withColumn("Bid", col("Bid").cast("string")))
    }
    assert(e.getMessage.contains("retyped: Bid"))
  }

  test("a pre-derived partition column is allowed") {
    val t = freshTable("derived")
    t.append(base.withColumn("DateTime_year", year(col("DateTime"))))
    assert(t.read().count() === 1L)
  }
}
