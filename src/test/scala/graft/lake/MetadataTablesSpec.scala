package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Metadata inspection tables: driver bookkeeping surfaced as
  * queryable DataFrames, consistent with the table state that produced
  * it.
  */
class MetadataTablesSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  test("snapshots/files/deletes/refs tables reflect the operations that built them") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("meta"), "t"), df(Seq(0)).schema, Some("DateTime"))
    t.append(df(0 until 6))
    t.morDeleteKeys(df(Seq(1)).select("EventId"), "EventId")
    t.morDeleteWhere(col("Bid") === 4.0)
    t.tagSnapshot("pin", t.snapshots.head.id)
    t.createBranch("stage")

    val snaps = t.metadataTable("snapshots")
    assert(snaps.count() == 3)
    assert(snaps.filter(col("is_current")).count() == 1)
    assert(snaps.select("operation").collect().map(_.getString(0)).count(_ == "mor-delete") == 2)

    val files = t.metadataTable("files")
    assert(files.agg(sum("rows")).head().getLong(0) == 6L)
    assert(files.select("partition").head().getMap[String, String](0)
      .keys.toSet == Set("DateTime_year"))

    val dels = t.metadataTable("deletes")
    assert(dels.select("kind").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("equality", "positional"))

    val refs = t.metadataTable("refs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs == Set(("pin", "tag"), ("stage", "branch")))

    val parts = t.metadataTable("partitions")
    assert(parts.count() == 1 && parts.select("files").head().getLong(0) >= 1L)
    // per-partition key coverage (round 15): the bounds ride along
    val span = parts.select("min_key_us", "max_key_us").head()
    assert(!span.isNullAt(0) && !span.isNullAt(1) &&
      span.getLong(0) <= span.getLong(1))

    intercept[IllegalArgumentException](t.metadataTable("nope"))
  }

  test("manifests table carries the pruning summaries") {
    val src = Seq(("A", Timestamp.valueOf("2024-01-01 01:00:00"), 1.0),
      ("B", Timestamp.valueOf("2024-01-02 01:00:00"), 2.0)).toDF("sym", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("meta"), "m"), src.schema,
      Seq("sym" -> "identity", "ts" -> "day"))
    t.append(src.filter($"sym" === "A"))
    t.append(src.filter($"sym" === "B"))
    val m = t.metadataTable("manifests")
    assert(m.count() == 2)
    val sums = m.select("partition_values").collect()
      .map(_.getMap[String, Seq[String]](0)("sym").head).toSet
    assert(sums == Set("A", "B"), "each manifest summarizes its own symbol")
  }

  test("storage table reports sidecar usage, metadata bytes, and cache stats") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("meta"), "st"), df(Seq(0)).schema, Some("DateTime"))
    t.setProperty("write.key-bloom.bits", "4096")
    t.setProperty("write.key-bloom.location", "sidecar")
    t.append(df(0 until 6))
    t.append(df(6 until 12))
    val row = t.metadataTable("storage").head()
    def l(name: String) = row.getLong(row.fieldIndex(name))
    assert(l("data_files") == t.currentDataFiles.size.toLong)
    assert(l("snapshots") == 2L)
    assert(l("manifest_bytes") > 0L && l("manifest_list_bytes") > 0L &&
      l("version_bytes") > 0L)
    // both commits' sidecars are live — live == total, nothing orphaned
    assert(l("bloom_bytes_total") > 0L)
    assert(l("bloom_bytes_live") == l("bloom_bytes_total"))
    // warm the planning cache, then the JVM-global occupancy is visible
    t.read().count()
    val row2 = t.metadataTable("storage").head()
    assert(row2.getLong(row2.fieldIndex("jvm_cache_entries")) > 0L)
    // compact (new files, new sidecar generation), then expire the
    // pre-compaction snapshots: their generations orphan and the table
    // reads live < total until the reaper runs
    t.compact(1)
    val (expired, _) = t.expireSnapshots(
      nowMs = System.currentTimeMillis() + 30L * 24 * 3600 * 1000,
      retentionMs = 0L, keepLast = 1)
    assert(expired.nonEmpty)
    val row3 = t.metadataTable("storage").head()
    def l3(name: String) = row3.getLong(row3.fieldIndex(name))
    assert(l3("bloom_bytes_live") < l3("bloom_bytes_total"),
      "expired snapshots' sidecar generations must read as orphaned drift")
    // and the SQL surface serves the same table as `cat.ns.t.storage`
    val wh = tmpDir("meta-sql")
    spark.conf.set("spark.sql.catalog.g_st", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g_st.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g_st.ns")
    df(0 until 4).writeTo("g_st.ns.obs").create()
    val sqlRow = spark.sql("SELECT data_files, snapshots FROM g_st.ns.obs.storage").head()
    assert(sqlRow.getLong(0) >= 1L && sqlRow.getLong(1) == 1L)
  }
}
