package graft.ingest

import graft.SparkSpec

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

/** Parallel symbol ingest: independent tables loaded from several driver
  * threads must produce exactly the sequential result (same tables, same
  * rows, same ledger, idempotent re-run).
  */
class ParallelIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeSymbolFile(root: String, symbol: String, ids: Range): Unit = {
    val df = ids.map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.$i%06d"), 1.0 + i, 2.0 + i))
      .toDF("DateTime", "Bid", "Ask")
    val tmp = tmpDir("pstage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(Paths.get(root, symbol))
    Files.copy(part, Paths.get(root, symbol, "batch.parquet"), StandardCopyOption.REPLACE_EXISTING)
  }

  test("three symbols ingest concurrently into three correct tables") {
    val root = tmpDir("proot")
    writeSymbolFile(root, "AAA", 0 until 150)
    writeSymbolFile(root, "BBB", 0 until 200)
    writeSymbolFile(root, "CCC", 0 until 250)

    val pipeline = new IngestPipeline(spark,
      IngestConfig(warehouseDir = tmpDir("pwh"), minRows = 10L, symbolParallelism = 3))
    val summary = pipeline.run(root)

    assert(summary.tables.map(_.table) === Seq("gold.aaa", "gold.bbb", "gold.ccc"))
    assert(summary.totalRowsAppended === 600L)
    assert(pipeline.catalog.loadTable("gold.aaa").read().count() === 150L)
    assert(pipeline.catalog.loadTable("gold.bbb").read().count() === 200L)
    assert(pipeline.catalog.loadTable("gold.ccc").read().count() === 250L)

    // idempotent re-run: every file checksum-skips, nothing appends
    val again = pipeline.run(root)
    assert(again.totalRowsAppended === 0L)
    assert(again.tables.map(_.filesSkipped).sum === 3)
  }
}
