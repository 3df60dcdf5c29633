package graft.stream

import graft.SparkSpec
import graft.ingest.{IngestConfig, IngestPipeline}

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

/** Root-level multi-symbol watcher (VERDICT r3 item 4) and the
  * streaming modified-file re-ingest (item 5): one query over the data
  * root populates every symbol table, and an in-place file modification
  * — invisible to the file source's checkpoint — still lands through
  * the ledger sweep.
  */
class RootWatcherSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, ids: Range, bidBase: Double = 1.0): Unit = {
    val df = ids.map(i =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d.$i%06d"), bidBase + i, 2.0 + i))
      .toDF("DateTime", "Bid", "Ask")
    val tmp = tmpDir("stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(Paths.get(dir))
    Files.copy(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("one root query ingests every symbol folder into its own table") {
    val root = tmpDir("root")
    val ckpt = tmpDir("ckpt")
    val pipeline = new IngestPipeline(spark, IngestConfig(warehouseDir = tmpDir("wh"), minRows = 10L))
    writeFile(s"$root/EURUSD", "a.parquet", 0 until 100)
    writeFile(s"$root/USDJPY", "b.parquet", 0 until 60)
    val schema = spark.read.parquet(s"$root/EURUSD/a.parquet").schema

    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)
    assert(pipeline.catalog.loadTable("gold.eurusd").read().count() == 100)
    assert(pipeline.catalog.loadTable("gold.usdjpy").read().count() == 60)

    // a later file in ONE symbol lands only there, same query/checkpoint
    writeFile(s"$root/USDJPY", "c.parquet", 60 until 90)
    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)
    assert(pipeline.catalog.loadTable("gold.eurusd").read().count() == 100)
    assert(pipeline.catalog.loadTable("gold.usdjpy").read().count() == 90)
    // no phantom snapshot for the untouched symbol
    assert(pipeline.catalog.loadTable("gold.eurusd").snapshots.size == 1)
  }

  test("modified file re-ingests through the ledger sweep (upsert policy)") {
    val root = tmpDir("root")
    val ckpt = tmpDir("ckpt")
    val pipeline = new IngestPipeline(spark, IngestConfig(
      warehouseDir = tmpDir("wh"), minRows = 10L, duplicateKeyPolicy = "upsert"))
    writeFile(s"$root/EURUSD", "a.parquet", 0 until 50, bidBase = 1.0)
    val schema = spark.read.parquet(s"$root/EURUSD/a.parquet").schema
    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)
    val table = pipeline.catalog.loadTable("gold.eurusd")
    assert(table.read().count() == 50)
    assert(table.read().agg(org.apache.spark.sql.functions.min("Bid")).head().getDouble(0) == 1.0)

    // overwrite IN PLACE with new values, same keys: the checkpoint
    // won't re-deliver, the sweep must
    writeFile(s"$root/EURUSD", "a.parquet", 0 until 50, bidBase = 1000.0)
    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)
    val after = pipeline.catalog.loadTable("gold.eurusd").read()
    assert(after.count() == 50) // replaced, not duplicated
    assert(after.agg(org.apache.spark.sql.functions.min("Bid")).head().getDouble(0) == 1000.0)
  }

  test("drop policy: modified file re-reads but appends nothing (reference parity)") {
    val root = tmpDir("root")
    val ckpt = tmpDir("ckpt")
    val pipeline = new IngestPipeline(spark, IngestConfig(warehouseDir = tmpDir("wh"), minRows = 10L))
    writeFile(s"$root/EURUSD", "a.parquet", 0 until 50)
    val schema = spark.read.parquet(s"$root/EURUSD/a.parquet").schema
    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)

    writeFile(s"$root/EURUSD", "a.parquet", 0 until 50, bidBase = 999.0)
    WatcherStream.drainRootOnce(spark, pipeline, root, schema, ckpt)
    val after = pipeline.catalog.loadTable("gold.eurusd").read()
    assert(after.count() == 50)
    // first-write-wins: the modified values did NOT land
    assert(after.agg(org.apache.spark.sql.functions.min("Bid")).head().getDouble(0) == 1.0)
  }
}
