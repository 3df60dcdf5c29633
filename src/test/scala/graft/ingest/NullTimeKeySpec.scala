package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ADVICE r1 regression: null-time-key rows pass QC (under the 5% null
  * tolerance) but can never be deduplicated by the equi-anti-join, so
  * re-ingesting an overlapping batch used to append them again. The
  * pipeline must reject them up front and keep the table null-free.
  */
class NullTimeKeySpec extends SparkSpec {
  import spark.implicits._

  private def batchWithNulls = {
    val base = (1 to 200).map(i => (Some(i.toLong * 1000000L), i.toDouble, i.toDouble + 0.5))
    val nulls = Seq((Option.empty[Long], 1.0, 1.5), (Option.empty[Long], 2.0, 2.5))
    (base ++ nulls).toDF("ts_us", "Bid", "Ask")
      .select(timestamp_micros(col("ts_us")).as("DateTime"), col("Bid"), col("Ask"))
  }

  test("null-key rows are rejected and never accumulate across re-ingests") {
    val cfg = IngestConfig(warehouseDir = tmpDir("graft-nullkey"))
    val pipeline = new IngestPipeline(spark, cfg)

    val r1 = pipeline.ingestBatch("sym", batchWithNulls)
    assert(r1.appended === 200L)
    assert(r1.rejected === 2L)
    assert(r1.issues.exists(_.contains("null DateTime")))

    // fully overlapping re-ingest: nothing appends — especially not the
    // null-key rows that the anti-join cannot match
    val r2 = pipeline.ingestBatch("sym", batchWithNulls)
    assert(r2.appended === 0L)
    assert(r2.rejected === 2L)

    val table = pipeline.catalog.loadTable("gold.sym").read()
    assert(table.count() === 200L)
    assert(table.filter(col("DateTime").isNull).count() === 0L)
  }
}
