package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Pre-round-16 metadata shapes that a CURRENT reader must survive
  * (ADVICE r15): manifests whose partition-value summaries recorded
  * the literal empty string (committed before the ''→sentinel
  * mapping), and imported time-partition dirs whose ints are
  * malformed or negative. Both are forged through the REAL manifest
  * writer + a commit, the way [[AddFilesSpec]] seeds its pre-r16
  * double bounds — no codec bypass, so the shapes are exactly what an
  * old engine left on disk.
  */
class LegacyMetadataSpec extends SparkSpec {
  import spark.implicits._

  /** Append `extra` entries (whose data files the caller already put
    * under `data/`) as a forged commit through the real SnapshotLog.
    */
  private def forgeCommit(t: LakehouseTable, extra: Seq[DataFile]): Unit = {
    val meta = t.metadata
    val current = meta.currentSnapshot.get
    val slog = new SnapshotLog(t.tableDir, spark.sessionState.newHadoopConf())
    val files = t.currentDataFiles ++ extra
    val snapId = meta.snapshots.map(_.id).max + 1
    val ref = slog.writeManifest(snapId, files)
    val listPath = slog.writeManifestList(snapId, Seq(ref))
    val snap = Snapshot(id = snapId, parentId = Some(current.id),
      timestampMs = System.currentTimeMillis(), operation = "forge-legacy",
      manifestList = Some(listPath), addedManifest = None,
      addedFilesCount = extra.size, addedRows = extra.map(_.rows).sum,
      totalRows = current.totalRows + extra.map(_.rows).sum)
    slog.commit(slog.currentVersion, meta.copy(
      snapshots = meta.snapshots :+ snap, currentSnapshotId = Some(snap.id)))
  }

  /** Copy the table's one live data file under a NEW partition dir and
    * return a manifest entry for it (rows/bounds cloned).
    */
  private def cloneFileUnder(t: LakehouseTable, dir: String): DataFile = {
    val src = t.currentDataFiles.head
    val fs = t.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val srcPath = new Path(t.tableDir, src.path)
    val name = srcPath.getName
    val dstRel = s"data/$dir/$name"
    val dst = new Path(t.tableDir, dstRel)
    fs.mkdirs(dst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcPath, fs, dst, false,
      spark.sessionState.newHadoopConf())
    src.copy(path = dstRel)
  }

  test("pre-sentinel-fix '' summaries still match a sym = '' probe (ADVICE r15)") {
    val data = Seq(("a", Timestamp.valueOf("2024-03-01 10:00:00"), 1.0))
      .toDF("sym", "ts", "px")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("legacy-empty"), "t"), data.schema,
      Seq("sym" -> "identity", "ts" -> "day"))
    t.append(data.coalesce(1))
    // the legacy layout: a file under the literal `sym=` dir — its
    // manifest summary records "" (the real writer derives summaries
    // from the path segments, exactly like the pre-fix engine did)
    val legacy = cloneFileUnder(t, "sym=/ts_day=20240301")
    forgeCommit(t, Seq(legacy))
    assert(t.manifestsForQuery(Map("sym" -> "")).nonEmpty,
      "the '' probe must keep the manifest whose summary recorded ''")
    val kept = t.filesForQuery(Map("sym" -> ""))
    assert(kept.exists(_.path == legacy.path),
      s"the legacy ''-dir file must survive the probe: ${kept.map(_.path)}")
    // and the sentinel dir itself still matches too (null and '' share it)
    assert(t.filesForQuery(Map("sym" -> "")).forall(f =>
      f.partitionSegments.get("sym").forall(v =>
        v == "" || v == LakehouseTable.HiveDefaultPartition)))
  }

  test("malformed or negative imported time dirs bail the group rewrite to the scan (ADVICE r15)") {
    val (cat, wh) = {
      val wh0 = tmpDir("legacy-dirs-wh")
      val c = "glegacy"
      spark.conf.set(s"spark.sql.catalog.$c", classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh0)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $c.gold")
      (c, wh0)
    }
    val data = (0 until 4)
      .map(i => (Timestamp.valueOf(f"2024-03-01 10:00:0$i"), i.toLong))
      .toDF("ts", "uid")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/tdirs"), data.schema, Some("ts"), "day")
    t.append(data.coalesce(1))
    // month 13 would throw from LocalDate.of pre-fix; a negative int
    // mis-inverted under truncating division — both must now BAIL the
    // metadata group rewrite and fall to the (exact) scan
    val bad1 = cloneFileUnder(t, "ts_day=20241301")
    val bad2 = cloneFileUnder(t, "ts_day=-44")
    forgeCommit(t, Seq(bad1, bad2))
    val q = spark.sql(
      s"SELECT month(ts) AS m, count(*) AS n FROM $cat.gold.tdirs GROUP BY month(ts)")
    // 3 copies of the same 4 rows, all really March
    assert(q.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      == Seq((3, 12L)), "the fallback scan must answer exactly")
    // CAST-to-date grouping exercises the LocalDate.of leg specifically
    val q2 = spark.sql(
      s"SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM $cat.gold.tdirs GROUP BY 1")
    assert(q2.collect().map(_.getLong(1)).toSeq == Seq(12L))
  }

  test("maintain fires the fold on unproven double pairs and goes quiet after one sweep") {
    val data = (0 until 8)
      .map(i => (Timestamp.valueOf(f"2024-03-01 10:00:0$i"), i / 10.0))
      .toDF("ts", "d")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("legacy-maint"), "t"), data.schema, Some("ts"), "day")
    t.setProperty("write.stats-columns", "d")
    t.append(data.coalesce(1))
    // seed the pre-r16 shape: strip the proven marker off the live
    // entries' pairs, through the real writer (dPv absent ⇒ 'd:')
    locally {
      val meta = t.metadata
      val current = meta.currentSnapshot.get
      val slog = new SnapshotLog(t.tableDir, spark.sessionState.newHadoopConf())
      val unproven = t.currentDataFiles.map(f => f.copy(extraBounds =
        f.extraBounds.map(_.map(b =>
          if (b.isDouble) b.copy(dPv = None) else b))))
      val snapId = meta.snapshots.map(_.id).max + 1
      val ref = slog.writeManifest(snapId, unproven)
      val snap = Snapshot(id = snapId, parentId = Some(current.id),
        timestampMs = System.currentTimeMillis(), operation = "forge-pre-r16",
        manifestList = Some(slog.writeManifestList(snapId, Seq(ref))),
        addedManifest = None, addedFilesCount = 0, addedRows = 0L,
        totalRows = current.totalRows)
      slog.commit(slog.currentVersion, meta.copy(
        snapshots = meta.snapshots :+ snap, currentSnapshotId = Some(snap.id)))
    }
    assert(t.currentDataFiles.exists(_.extraBounds.getOrElse(Nil)
      .exists(b => b.isDouble && !b.dProven)), "seed must be unproven")
    // no compaction/fold pressure — ONLY the hygiene signal fires
    val rep = t.maintain(maxFilesPerPartition = 1000, maxManifests = 1000)
    assert(rep.manifestsFolded, "unproven pairs are fold pressure")
    assert(t.currentDataFiles.forall(_.extraBounds.getOrElse(Nil)
      .forall(b => !b.isDouble || b.dProven)),
      "the sweep must re-prove the native pairs")
    // quiet afterwards: the same call finds nothing to do
    val rep2 = t.maintain(maxFilesPerPartition = 1000, maxManifests = 1000)
    assert(!rep2.manifestsFolded, "the hygiene signal must go quiet")
  }

  test("a month-13 dir ALONE bails too — no exception ever fired there, only a phantom group") {
    // the sharpest leg: month(ts) over a 20241301 dir never throws —
    // the truncating arithmetic happily derives month 13, so before
    // the dir-int validation the rewrite SERVED a phantom group 13
    // alongside the real answer. No negative dir to save it here.
    val wh = tmpDir("legacy-m13-wh")
    val cat = "glegacy13"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
    val data = (0 until 4)
      .map(i => (Timestamp.valueOf(f"2024-03-01 10:00:0$i"), i.toLong))
      .toDF("ts", "uid")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/tm13"), data.schema, Some("ts"), "day")
    t.append(data.coalesce(1))
    forgeCommit(t, Seq(cloneFileUnder(t, "ts_day=20241301")))
    val q = spark.sql(
      s"SELECT month(ts) AS m, count(*) AS n FROM $cat.gold.tm13 GROUP BY month(ts)")
    assert(q.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      == Seq((3, 8L)), "both copies are really March; no group 13 may exist")
  }
}
