package graft.stream

import graft.SparkSpec
import graft.ingest.{IngestConfig, IngestPipeline}

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

class WatcherStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, ids: Range): Unit = {
    val df = ids.map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.$i%06d"), 1.0 + i, 2.0 + i))
      .toDF("DateTime", "Bid", "Ask")
    val tmp = tmpDir("stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(Paths.get(dir))
    Files.copy(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  private def cfg(wh: String) = IngestConfig(warehouseDir = wh, minRows = 10L)

  test("stream drains files once, dedups overlap across triggers, and is restart-safe") {
    val src = tmpDir("src")
    val ckpt = tmpDir("ckpt")
    val wh = tmpDir("wh")
    val pipeline = new IngestPipeline(spark, cfg(wh))
    writeFile(src, "a.parquet", 0 until 100)
    val schema = spark.read.parquet(s"$src/a.parquet").schema

    WatcherStream.drainOnce(spark, pipeline, src, "ticks", schema, ckpt)
    assert(pipeline.catalog.loadTable("gold.ticks").read().count() == 100)

    // second drain with the SAME checkpoint: a.parquet already seen,
    // b.parquet overlaps 50 rows — only the 50 new rows land
    writeFile(src, "b.parquet", 50 until 150)
    WatcherStream.drainOnce(spark, pipeline, src, "ticks", schema, ckpt)
    val table = pipeline.catalog.loadTable("gold.ticks")
    assert(table.read().count() == 150)
    // snapshots: one per non-empty appended batch
    assert(table.snapshots.size == 2)

    // third drain with nothing new: no batch, no snapshot
    WatcherStream.drainOnce(spark, pipeline, src, "ticks", schema, ckpt)
    assert(pipeline.catalog.loadTable("gold.ticks").snapshots.size == 2)
  }

  test("QC-failing micro-batch is rejected, stream keeps going") {
    val src = tmpDir("src")
    val wh = tmpDir("wh")
    val pipeline = new IngestPipeline(spark, cfg(wh))
    writeFile(src, "tiny.parquet", 0 until 5) // below minRows
    val schema = spark.read.parquet(s"$src/tiny.parquet").schema
    WatcherStream.drainOnce(spark, pipeline, src, "ticks", schema, tmpDir("ckpt"))
    assert(!pipeline.catalog.tableExists("gold.ticks"))
  }
}
