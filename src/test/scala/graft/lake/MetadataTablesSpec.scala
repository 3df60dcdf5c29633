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
    // round 18: native writes record on-disk sizes in the manifest
    assert(files.filter(col("bytes").isNull).count() == 0 &&
      files.agg(sum("bytes")).head().getLong(0) > 0L)

    val dels = t.metadataTable("deletes")
    assert(dels.select("kind").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("equality", "positional"))

    val refs = t.metadataTable("refs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs == Set(("pin", "tag"), ("stage", "branch")))

    val parts = t.metadataTable("partitions")
    assert(parts.count() == 1 && parts.select("files").head().getLong(0) >= 1L)
    // per-partition size totals (round 18): complete across members
    assert(parts.select("data_bytes").head().getLong(0) > 0L)
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

  test("sum_coverage table reports per-column servability and why not") {
    // round 17, VERDICT r16 #7: the operator's "has write.sum-columns
    // earned out?" question — flags here must mirror the serving gates
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("sumcov"), "t"), df(Seq(0)).schema, Some("DateTime"))
    // one file written BEFORE the property: no recorded sums
    t.append(df(0 until 3).coalesce(1))
    t.setProperty("write.sum-columns", "EventId")
    t.setProperty("write.stats-columns", "EventId")
    t.append(df(3 until 6).coalesce(1))
    val r1 = t.metadataTable("sum_coverage").head()
    def g[A](row: org.apache.spark.sql.Row, n: String): A =
      row.getAs[A](row.fieldIndex(n))
    assert(g[String](r1, "column") == "EventId")
    assert(g[Long](r1, "files") == 2L && g[Long](r1, "files_with_sums") == 1L)
    assert(!g[Boolean](r1, "sum_servable_legacy"))
    assert(g[String](r1, "reason") == "missing_sums:1")
    // compaction re-earns the sums: everything turns servable
    t.compact(1)
    val r2 = t.metadataTable("sum_coverage").head()
    assert(g[Long](r2, "files_with_sums") == g[Long](r2, "files"))
    assert(g[Boolean](r2, "sum_servable_legacy") &&
      g[Boolean](r2, "sum_servable_ansi") && g[Boolean](r2, "avg_servable"))
    assert(g[Long](r2, "total_sum") == (0 until 6).map(_.toLong).sum)
    assert(g[String](r2, "reason") == "ok")
    // a live merge-on-read mask suspends everything, visibly
    t.morDeleteKeys(df(Seq(2)).select("EventId"), "EventId")
    val r3 = t.metadataTable("sum_coverage").head()
    assert(!g[Boolean](r3, "sum_servable_legacy") &&
      g[String](r3, "reason") == "live_mask")
    // SQL surface: `cat.ns.t.sum_coverage`
    val wh = tmpDir("sumcov-sql")
    spark.conf.set("spark.sql.catalog.g_sc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g_sc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g_sc.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS g_sc.ns.cov (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES " +
      "('write.sum-columns'='v', 'write.stats-columns'='v')")
    spark.sql("INSERT INTO g_sc.ns.cov VALUES (TIMESTAMP '2024-01-01 00:00:00', 7)")
    val sqlRow = spark.sql(
      "SELECT column, sum_servable_ansi, reason FROM g_sc.ns.cov.sum_coverage").head()
    assert(sqlRow.getString(0) == "v" && sqlRow.getBoolean(1) &&
      sqlRow.getString(2) == "ok")
  }

  test("ndv_coverage walks the sketch lifecycle: pre-declaration, compact, widen") {
    // round 18: the "has write.ndv-columns earned out?" question —
    // flags mirror the serving gates (MetadataAggFacts.ndvCol), so a
    // servable=true row's ndv_estimate IS the metadata-only answer
    val data = (0 until 12)
      .map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i % 5))
      .toDF("DateTime", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("ndvcov"), "t"), data.schema, Some("DateTime"))
    def g[A](row: org.apache.spark.sql.Row, n: String): A =
      row.getAs[A](row.fieldIndex(n))
    // one file BEFORE the declaration: no sketch → missing_ndv
    t.append(data.filter(col("v") < 2).coalesce(1))
    t.setProperty("write.ndv-columns", "v")
    t.append(data.filter(col("v") >= 2).coalesce(1))
    val r1 = t.metadataTable("ndv_coverage").head()
    assert(g[String](r1, "column") == "v")
    assert(g[Long](r1, "files") == 2L && g[Long](r1, "files_with_ndv") == 1L)
    assert(!g[Boolean](r1, "servable") &&
      g[String](r1, "reason") == "missing_ndv:1")
    // compaction re-earns: servable, and the estimate is the value a
    // default-rsd approx_count_distinct(v) returns
    t.compact(1)
    val r2 = t.metadataTable("ndv_coverage").head()
    assert(g[Boolean](r2, "servable") && g[String](r2, "reason") == "ok")
    assert(g[Long](r2, "ndv_estimate") == 5L)
    // a widen makes the recorded INT-hashed registers stale → visible
    t.widenColumn("v", org.apache.spark.sql.types.LongType)
    val r3 = t.metadataTable("ndv_coverage").head()
    assert(!g[Boolean](r3, "servable") && g[String](r3, "reason") == "stale_type")
    // SQL surface
    val wh = tmpDir("ndvcov-sql")
    spark.conf.set("spark.sql.catalog.g_nc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g_nc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g_nc.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS g_nc.ns.nc (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('write.ndv-columns'='v')")
    spark.sql("INSERT INTO g_nc.ns.nc VALUES (TIMESTAMP '2024-01-01 00:00:00', 7)")
    val sqlRow = spark.sql(
      "SELECT column, servable, ndv_estimate, reason FROM g_nc.ns.nc.ndv_coverage").head()
    assert(sqlRow.getString(0) == "v" && sqlRow.getBoolean(1) &&
      sqlRow.getLong(2) == 1L && sqlRow.getString(3) == "ok")
  }

  test("ndv_coverage_groups names WHICH group's files miss sketches") {
    // the grouped analog of ndv_coverage: per (identity dir, column)
    // verdicts with the same gates the grouped rewrite serves under
    val data = (0 until 24)
      .map(i => (s"s${i % 2}",
        Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), (i % 7).toLong))
      .toDF("sym", "DateTime", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("ndvcovg"), "t"), data.schema,
      Seq("sym" -> "identity", "DateTime" -> "day"))
    t.setProperty("write.ndv-columns", "v")
    t.append(data.filter(col("sym") === "s0").coalesce(1))
    // an import lands sketch-less files in s1 ONLY
    val staged = new Path(tmpDir("ndvcovg-stage"), "s")
    data.filter(col("sym") === "s1").coalesce(1)
      .drop("sym").write.parquet(
        new Path(staged, "sym=s1/DateTime_day=20240101").toString)
    t.addFiles(staged)
    def g[A](row: org.apache.spark.sql.Row, n: String): A =
      row.getAs[A](row.fieldIndex(n))
    val rows = t.metadataTable("ndv_coverage_groups")
      .collect().filter(r => g[String](r, "group_column") == "sym")
    assert(rows.length == 2)
    val s0 = rows.find(r => g[String](r, "group_value") == "s0").get
    val s1 = rows.find(r => g[String](r, "group_value") == "s1").get
    assert(g[Boolean](s0, "servable") && g[String](s0, "reason") == "ok")
    assert(g[Long](s0, "ndv_estimate") == 7L,
      "the servable group's estimate IS the grouped rewrite's answer")
    assert(!g[Boolean](s1, "servable") &&
      g[String](s1, "reason") == "missing_ndv:1",
      "the import-fed group reports exactly which files miss sketches")
    // compaction re-earns s1
    t.compact(1)
    val after = t.metadataTable("ndv_coverage_groups")
      .collect().filter(r => g[String](r, "group_column") == "sym")
    assert(after.forall(r => g[Boolean](r, "servable") &&
      g[String](r, "reason") == "ok"))
  }

  test("sum_coverage_groups names WHICH group's files miss sums (round 18)") {
    // VERDICT r17 #6: per-identity-group rows — the operator sees that
    // only symbol B's files miss sums (an import) and compaction
    // re-earns them
    val src = (0 until 12).map(i =>
      (if (i < 6) "A" else "B",
        Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong))
      .toDF("sym", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("sumcovg"), "t"), src.schema,
      Seq("sym" -> "identity", "ts" -> "day"))
    t.setProperty("write.sum-columns", "v")
    t.setProperty("write.stats-columns", "v")
    t.append(src.filter($"sym" === "A").coalesce(1))
    // B's files arrive WITHOUT sums: stage a parquet layout (identity
    // column in the dir name only, as native writes lay out) and
    // import — TWO part files so compact(1) below has something to
    // merge when it re-earns the sums
    val staging = new Path(tmpDir("sumcovg-stage"), "s")
    withSqlConf("spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") {
      src.filter($"sym" === "B").select("ts", "v").repartition(2).write
        .parquet(new Path(staging, "sym=B/ts_day=20240101").toString)
    }
    t.addFiles(staging)
    def rows() = t.metadataTable("sum_coverage_groups").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
        r.getString(8)))
    val r1 = rows()
    // one row per (identity dim, dir value, column): sym has A and B
    val bySym = r1.filter(_._1 == "sym").map(r => r._2 -> r).toMap
    assert(bySym.keySet == Set("A", "B"))
    val (a, b) = (bySym("A"), bySym("B"))
    assert(a._4 == 1L && a._5 == 1L && a._6 && a._7 && a._8 && a._9 == "ok",
      s"A's native file serves: $a")
    assert(b._4 == 2L && b._5 == 0L && !b._6 && b._9 == "missing_sums:2",
      s"B's import must read as the missing group: $b")
    // compaction re-earns B's sums → every group serves
    t.compact(1)
    assert(rows().filter(_._1 == "sym").forall(r => r._6 && r._9 == "ok"))
    // table-level view agrees once the groups all serve
    val cov = t.metadataTable("sum_coverage").head()
    assert(cov.getString(cov.fieldIndex("reason")) == "ok")
    // SQL surface
    val wh = tmpDir("sumcovg-sql")
    spark.conf.set("spark.sql.catalog.g_scg", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g_scg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g_scg.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS g_scg.ns.cg " +
      "(sym STRING, ts TIMESTAMP, v BIGINT) PARTITIONED BY (sym, days(ts)) " +
      "TBLPROPERTIES ('write.sum-columns'='v', 'write.stats-columns'='v')")
    spark.sql("INSERT INTO g_scg.ns.cg VALUES " +
      "('x', TIMESTAMP '2024-01-01 00:00:00', 7), " +
      "('y', TIMESTAMP '2024-01-01 00:00:00', 8)")
    val sqlRows = spark.sql(
      "SELECT group_value, sum_servable_ansi, reason " +
        "FROM g_scg.ns.cg.sum_coverage_groups WHERE group_column = 'sym' " +
        "ORDER BY group_value").collect()
    assert(sqlRows.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(sqlRows.forall(r => r.getBoolean(1) && r.getString(2) == "ok"))
    // a null group value reports as the sentinel row, never servable
    t.append(Seq((null.asInstanceOf[String],
      Timestamp.valueOf("2024-01-01 00:00:01"), 99L)).toDF("sym", "ts", "v"))
    val sent = rows().find(_._2 == LakehouseTable.HiveDefaultPartition)
    assert(sent.exists(r => !r._6 && r._9 == "sentinel_dir"))
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
    // round 18: live data bytes from the manifest-recorded sizes —
    // fully sized on a native-write table, and the total matches the
    // actual on-disk sum
    assert(l("data_files_sized") == l("data_files"))
    assert(l("data_bytes_live") ==
      t.currentDataFiles.flatMap(_.bytes).sum && l("data_bytes_live") > 0L)
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
