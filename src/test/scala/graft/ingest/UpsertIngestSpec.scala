package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The modified-file re-ingest gap: under the reference's drop policy a
  * changed file re-reads (checksum differs) but every key already
  * exists, so changed VALUES never land. The upsert policy merges them.
  */
class UpsertIngestSpec extends SparkSpec {
  import spark.implicits._

  private def batch(bidOffset: Double) =
    (0 until 120).map(i =>
      // Bid stays strictly positive (QC Q5) in the un-offset batch too
      (Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.$i%06d"), i + 1.0 + bidOffset, i + 0.5))
      .toDF("DateTime", "Bid", "Ask")

  test("drop policy: re-ingest of modified rows changes nothing (reference semantics)") {
    val p = new IngestPipeline(spark, IngestConfig(warehouseDir = tmpDir("drop"), minRows = 10L))
    p.ingestBatch("sym", batch(0.0))
    val r = p.ingestBatch("sym", batch(9000.0)) // same keys, new values
    assert(r.appended === 0L)
    val t = p.catalog.loadTable("gold.sym").read()
    assert(t.filter($"Bid" >= 9000.0).count() === 0L)
  }

  test("upsert policy: re-ingest of modified rows replaces them, no duplicates") {
    val p = new IngestPipeline(spark,
      IngestConfig(warehouseDir = tmpDir("ups"), minRows = 10L, duplicateKeyPolicy = "upsert"))
    p.ingestBatch("sym", batch(0.0))
    p.ingestBatch("sym", batch(9000.0))
    val t = p.catalog.loadTable("gold.sym").read()
    assert(t.count() === 120L) // still one row per key
    assert(t.filter($"Bid" >= 9000.0).count() === 120L) // all values updated
  }

  test("mor-upsert policy: same result as upsert with zero data files rewritten") {
    val p = new IngestPipeline(spark,
      IngestConfig(warehouseDir = tmpDir("mups"), minRows = 10L,
        duplicateKeyPolicy = "mor-upsert"))
    p.ingestBatch("sym", batch(0.0))
    val table = p.catalog.loadTable("gold.sym")
    val filesBefore = table.currentDataFiles.map(_.path).toSet

    p.ingestBatch("sym", batch(9000.0))
    val t = table.read()
    assert(t.count() === 120L)
    assert(t.filter($"Bid" >= 9000.0).count() === 120L)
    assert(filesBefore.subsetOf(table.currentDataFiles.map(_.path).toSet),
      "merge-on-read must keep the original files in place")
    assert(table.currentDeleteFiles.nonEmpty, "the mask rides a delete file")
  }
}
