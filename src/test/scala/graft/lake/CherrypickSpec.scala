package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** cherrypick_snapshot: replay append-shaped snapshots by reference —
  * the WAP escape hatch when main advanced after the branch was cut.
  */
class CherrypickSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "k", "v")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("cherry"), name), df(Seq(0)).schema, Some("DateTime"))

  test("replays an audited branch append onto a moved main; files survive branch drop + expiry") {
    val t = fresh("wap")
    t.append(df(0 until 3))
    t.createBranch("audit")
    val staged = t.appendToBranch("audit", df(10 until 13))
    // main moves on — fastForward now rightly refuses
    t.append(df(3 until 6))
    intercept[IllegalArgumentException](t.fastForward("audit"))
    val picked = t.cherrypickSnapshot(staged.id)
    assert(picked.operation == "cherrypick")
    assert(t.read().count() == 9)
    assert(t.read().select("k").as[Long].collect().sorted.toSeq ==
      ((0L until 6L) ++ (10L until 13L)).sorted)
    // the source lineage can die without reaping the replayed files
    t.dropBranch("audit")
    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    t.expireSnapshots(nowMs = farFuture, retentionMs = 0L, keepLast = 1)
    assert(t.read().count() == 9, "cherry-picked rows must survive source expiry")
  }

  test("a retried pick of the same source refuses instead of duplicating rows") {
    val t = fresh("retry")
    t.append(df(0 until 3))
    t.createBranch("b")
    val staged = t.appendToBranch("b", df(10 until 12))
    t.append(df(3 until 5))
    t.cherrypickSnapshot(staged.id)
    assert(t.read().count() == 7)
    // runbook re-run / client-timeout retry: must refuse loudly
    val e = intercept[IllegalArgumentException](t.cherrypickSnapshot(staged.id))
    assert(e.getMessage.contains("already cherry-picked"), e.getMessage)
    assert(t.read().count() == 7, "retry must not have duplicated rows")
    // and picking the pick is caught by the ancestry guard
    val picked = t.metadata.currentSnapshot.get
    assert(picked.sourceSnapshotId.contains(staged.id))
    intercept[IllegalArgumentException](t.cherrypickSnapshot(picked.id))
  }

  test("refuses ancestry duplicates, row-removing shapes, and unknown ids") {
    val t = fresh("refuse")
    val s1 = t.append(df(0 until 4))
    t.append(df(4 until 6))
    // already in main ancestry: picking would duplicate rows
    val e1 = intercept[IllegalArgumentException](t.cherrypickSnapshot(s1.id))
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    // compaction replaces manifests: not append-shaped
    val c = t.compact()
    t.append(df(6 until 8))
    t.rollbackTo(s1.id)
    val e2 = intercept[IllegalArgumentException](t.cherrypickSnapshot(c.id))
    assert(e2.getMessage.contains("append-shaped"), e2.getMessage)
    // MoR delete commit: delete set changed
    t.append(df(20 until 22))
    val d = t.morDeleteKeys(Seq(20L).toDF("k"), "k")
    t.rollbackTo(s1.id)
    val e3 = intercept[IllegalArgumentException](t.cherrypickSnapshot(d.id))
    assert(e3.getMessage.toLowerCase.contains("cherry-pick") ||
      e3.getMessage.contains("added no files"), e3.getMessage)
    intercept[NoSuchElementException](t.cherrypickSnapshot(999L))
  }

  test("SQL procedure drives the same path") {
    val cat = "gcherry"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("gcherry-wh"))
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
    spark.sql(s"CREATE TABLE $cat.gold.t (k BIGINT, v DOUBLE)")
    val lt = LakehouseTable.load(spark,
      new Path(spark.conf.get(s"spark.sql.catalog.$cat.warehouse"), "gold/t"))
    lt.append(Seq((1L, 1.0)).toDF("k", "v"))
    lt.createBranch("b")
    val staged = lt.appendToBranch("b", Seq((9L, 9.0)).toDF("k", "v"))
    lt.append(Seq((2L, 2.0)).toDF("k", "v"))
    val r = spark.sql(
      s"CALL $cat.system.cherrypick_snapshot('gold.t', ${staged.id})").head()
    assert(r.getLong(0) == staged.id)
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.t").head().getLong(0) == 3L)
  }
}
