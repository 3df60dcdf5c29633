package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Branch refs + write-audit-publish: a batch staged on a branch is
  * invisible to main until fast-forwarded; a failed audit drops the
  * branch and main never saw it; expiry respects live branches and
  * reaps dropped ones.
  */
class BranchWapSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, i.toDouble))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("wap"), name), df(Seq(0)).schema, Some("DateTime"))

  private def ids(frame: org.apache.spark.sql.DataFrame): Set[Long] =
    frame.select("EventId").collect().map(_.getLong(0)).toSet

  test("the full WAP cycle: stage, audit-fail, drop; stage, audit-pass, publish") {
    val t = fresh("cycle")
    t.append(df(0 until 5))

    // --- bad batch: staged, audited, dropped — main never sees it
    t.createBranch("audit")
    t.appendToBranch("audit", df(Seq(100, 101)))
    assert(ids(t.read()) == (0L until 5L).toSet, "main is untouched while staged")
    assert(ids(t.readBranch("audit")) == (0L until 5L).toSet ++ Set(100L, 101L),
      "the branch sees base + staged batch")
    val qcFails = t.readBranch("audit").filter(col("EventId") >= 100L).count() > 0
    assert(qcFails)
    t.dropBranch("audit")
    assert(t.branches.isEmpty)
    assert(ids(t.read()) == (0L until 5L).toSet, "dropped staging never reached main")

    // --- good batch: staged, audited, fast-forwarded
    t.createBranch("audit")
    t.appendToBranch("audit", df(Seq(5, 6)))
    val published = t.fastForward("audit")
    assert(t.metadata.currentSnapshotId.contains(published))
    assert(ids(t.read()) == (0L until 7L).toSet, "publish makes the batch visible")
    t.dropBranch("audit")
  }

  test("fastForward refuses when main advanced since the branch was cut") {
    val t = fresh("race")
    t.append(df(0 until 3))
    t.createBranch("b")
    t.appendToBranch("b", df(Seq(10)))
    t.append(df(Seq(20))) // main moves underneath
    val e = intercept[IllegalArgumentException](t.fastForward("b"))
    assert(e.getMessage.contains("not an ancestor"))
    assert(ids(t.read()) == Set(0L, 1L, 2L, 20L), "main keeps its own lineage")
  }

  test("asOf follows main lineage only until publish") {
    val t = fresh("asof")
    t.append(df(0 until 3))
    t.createBranch("b")
    t.appendToBranch("b", df(Seq(10)))
    val afterStage = System.currentTimeMillis() + 1
    assert(ids(t.asOf(afterStage)) == Set(0L, 1L, 2L),
      "staged branch snapshot must not surface through asOf")
    t.fastForward("b")
    assert(ids(t.asOf(System.currentTimeMillis() + 1)) == Set(0L, 1L, 2L, 10L),
      "published snapshot joins main lineage")
  }

  test("expiry protects a live branch's chain and reaps a dropped one") {
    val t = fresh("expire")
    val fs = t.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    t.append(df(0 until 3))
    t.createBranch("b")
    t.appendToBranch("b", df(Seq(10)))
    t.appendToBranch("b", df(Seq(11))) // head + one intermediate
    t.append(df(Seq(20)))
    t.append(df(Seq(21)))

    val (expired1, _) = t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    assert(t.branches.contains("b"))
    assert(ids(t.readBranch("b")).contains(10L) && ids(t.readBranch("b")).contains(11L),
      "live branch chain survives expiry")
    assert(!expired1.contains(t.branches("b")))

    val stagedFile = new Path(t.tableDir,
      t.addedDataFiles(t.metadata.snapshotById(t.branches("b")).get).head.path)
    assert(fs.exists(stagedFile))
    t.dropBranch("b")
    t.append(df(Seq(22))) // age the window
    val (expired2, deleted) = t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    assert(expired2.nonEmpty)
    assert(!fs.exists(stagedFile), "dropped branch's staged files are reaped")
    assert(deleted.nonEmpty)
    assert(ids(t.read()) == Set(0L, 1L, 2L, 20L, 21L, 22L))
  }

  test("branch bookkeeping guards") {
    val t = fresh("guards")
    t.append(df(0 until 2))
    t.createBranch("b")
    val e1 = intercept[IllegalArgumentException](t.createBranch("b"))
    assert(e1.getMessage.contains("already exists"))
    t.tagSnapshot("pin", t.metadata.currentSnapshotId.get)
    val e2 = intercept[IllegalArgumentException](t.createBranch("pin"))
    assert(e2.getMessage.contains("tag"))
    intercept[NoSuchElementException](t.appendToBranch("nope", df(Seq(9))))
    intercept[NoSuchElementException](t.readBranch("nope"))
    intercept[NoSuchElementException](t.fastForward("nope"))
    // publishing a branch at parity with main is a no-op, not an error
    assert(t.fastForward("b") == t.metadata.currentSnapshotId.get)
    // branches cut from published history only: a snapshot staged on
    // another branch cannot seed a new branch
    val staged = t.appendToBranch("b", df(Seq(50)))
    val e3 = intercept[IllegalArgumentException](t.createBranch("b2", staged.id))
    assert(e3.getMessage.contains("staged on"))
  }

  test("branch appends race main appends: both land, neither clobbers") {
    val t = fresh("parallel")
    t.append(df(0 until 2))
    t.createBranch("b")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fMain = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 4).foreach(i => t.append(df(Seq(100 + i))))
      })
      val fBranch = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 4).foreach(i => t.appendToBranch("b", df(Seq(200 + i))))
      })
      fMain.get(); fBranch.get()
    } finally pool.shutdown()
    assert(ids(t.read()) == Set(0L, 1L) ++ (100L until 104L),
      "main sees its own appends and nothing staged")
    assert(ids(t.readBranch("b")) == Set(0L, 1L) ++ (200L until 204L),
      "the branch accumulated every staged append despite the race")
  }

  test("two branches stage independently; publishing one leaves the other intact") {
    val t = fresh("two")
    t.append(df(0 until 2))
    t.createBranch("x"); t.createBranch("y")
    t.appendToBranch("x", df(Seq(10)))
    t.appendToBranch("y", df(Seq(20)))
    t.fastForward("x")
    assert(ids(t.read()) == Set(0L, 1L, 10L))
    assert(ids(t.readBranch("y")) == Set(0L, 1L, 20L),
      "the unpublished branch still reads its own staging")
    // y's base (main@cut) is an ancestor of y's head, but main moved to x's
    // head — y can no longer fast-forward without re-staging
    val e = intercept[IllegalArgumentException](t.fastForward("y"))
    assert(e.getMessage.contains("not an ancestor"))
  }
}
