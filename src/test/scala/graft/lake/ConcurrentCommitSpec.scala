package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp
import java.util.concurrent.CountDownLatch

/** Optimistic rebase-retry for commuting commits (VERDICT r4 #2):
  * appends commute, so two independent writers sharing ONE table —
  * no pipeline lock, separate table handles — must both land, with
  * exact totalRows, distinct snapshot ids, and a linear version
  * history. This is Iceberg's append retry semantics.
  */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(ids: Range) =
    ids.map(i => (Timestamp.valueOf(f"2021-01-01 00:00:${i % 60}%02d.$i%06d"), i.toDouble, i.toLong))
      .toDF("DateTime", "Bid", "id")

  test("two unsynchronized writers appending to one table: both land, totalRows exact") {
    val dir = new Path(tmpDir("ccs"), "t1")
    LakehouseTable.createIfNotExists(spark, dir, mkRows(0 until 1).schema, Some("DateTime"))
    // independent handles: nothing shared but the table directory
    val handles = Seq(LakehouseTable.load(spark, dir), LakehouseTable.load(spark, dir))
    val batchesPerWriter = 3
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = handles.zipWithIndex.map { case (t, w) =>
      new Thread(() => {
        start.await()
        try (0 until batchesPerWriter).foreach { b =>
          val base = (w * 10000) + b * 1000
          t.append(mkRows(base until (base + 50 + w * 10)))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${errors.toArray.mkString("; ")}")

    val table = LakehouseTable.load(spark, dir)
    val expectRows = (50L + 60L) * batchesPerWriter
    assert(table.snapshots.size == 2 * batchesPerWriter, "every append must commit a snapshot")
    assert(table.snapshots.map(_.id).distinct.size == table.snapshots.size)
    assert(table.metadata.currentSnapshot.get.totalRows == expectRows)
    assert(table.read().count() == expectRows)
    assert(table.read().select("id").distinct().count() == expectRows)
    // linear history: one version per commit, no gaps
    assert(table.log.currentVersion == 2L * batchesPerWriter)
  }

  test("rewriteManifests retries across concurrent appends without losing files") {
    val dir = new Path(tmpDir("ccs"), "t2")
    val table = LakehouseTable.createIfNotExists(spark, dir, mkRows(0 until 1).schema, Some("DateTime"))
    table.append(mkRows(0 until 30))
    val appender = LakehouseTable.load(spark, dir)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tA = new Thread(() => {
      start.await()
      try (1 to 3).foreach(b => appender.append(mkRows(b * 1000 until (b * 1000 + 20))))
      catch { case e: Throwable => errors.add(e) }
    })
    val tB = new Thread(() => {
      start.await()
      try (1 to 3).foreach(_ => table.rewriteManifests())
      catch { case e: Throwable => errors.add(e) }
    })
    tA.start(); tB.start(); start.countDown(); tA.join(); tB.join()
    assert(errors.isEmpty, s"concurrent maintenance failed: ${errors.toArray.mkString("; ")}")
    val reloaded = LakehouseTable.load(spark, dir)
    assert(reloaded.read().count() == 30 + 3 * 20)
    assert(reloaded.metadata.currentSnapshot.get.totalRows == 30 + 3 * 20)
  }

  test("expiry rebases across a concurrent appender: both commit, no live file deleted") {
    val dir = new Path(tmpDir("ccs"), "t4")
    val table = LakehouseTable.createIfNotExists(spark, dir, mkRows(0 until 1).schema, Some("DateTime"))
    (0 until 3).foreach(b => table.append(mkRows(b * 100 until (b * 100 + 10))))
    // compaction + one more append strand the three small
    // pre-compaction files: once the newest-2 protected snapshots are
    // both post-compaction, those files are exactly what a successful
    // expiry must physically delete, while every retained snapshot's
    // files must survive
    table.compact()
    table.append(mkRows(500 until 510))
    val appender = LakehouseTable.load(spark, dir)
    val expirer = LakehouseTable.load(spark, dir)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var expiredIds: Seq[Long] = Nil
    @volatile var deleted: Seq[String] = Nil
    val tA = new Thread(() => {
      start.await()
      try (1 to 3).foreach(b => appender.append(mkRows(b * 1000 until (b * 1000 + 20))))
      catch { case e: Throwable => errors.add(e) }
    })
    val tB = new Thread(() => {
      start.await()
      // nowMs 8 days ahead puts every existing snapshot past the 7-day
      // retention; keepLast still protects the newest two
      try {
        val (ids, del) = expirer.expireSnapshots(
          nowMs = System.currentTimeMillis() + 8L * 24 * 3600 * 1000, keepLast = 2)
        expiredIds = ids; deleted = del
      } catch { case e: Throwable => errors.add(e) }
    })
    tA.start(); tB.start(); start.countDown(); tA.join(); tB.join()
    assert(errors.isEmpty, s"concurrent expiry/append failed: ${errors.toArray.mkString("; ")}")
    assert(expiredIds.nonEmpty, "expiry must have expired the pre-compaction snapshots")

    val reloaded = LakehouseTable.load(spark, dir)
    // every appended row is still readable: nothing live was deleted
    assert(reloaded.read().count() == 30 + 10 + 3 * 20)
    // all current files physically exist
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    reloaded.currentDataFiles.foreach(f =>
      assert(fs.exists(new Path(dir, f.path)), s"live file ${f.path} was deleted"))
    // the stranded pre-compaction files were reaped
    assert(deleted.nonEmpty, "expiry should have deleted the stranded pre-compaction files")
    deleted.foreach(f => assert(!fs.exists(new Path(dir, f))))
  }

  test("non-commuting delete does NOT retry: a stale commit surfaces the conflict") {
    val dir = new Path(tmpDir("ccs"), "t3")
    val table = LakehouseTable.createIfNotExists(spark, dir, mkRows(0 until 1).schema, Some("DateTime"))
    table.append(mkRows(0 until 20))
    val e = intercept[ConcurrentCommitException] {
      table.log.commit(0L, table.metadata) // stale expectedVersion
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("double delivery of one stream batch: exactly one of two racing commits lands") {
    val dir = new Path(tmpDir("ccs"), "t5")
    LakehouseTable.createIfNotExists(spark, dir, mkRows(0 until 1).schema, Some("DateTime"))
    val handles = Seq(LakehouseTable.load(spark, dir), LakehouseTable.load(spark, dir))
    val batch = mkRows(0 until 40)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // two unsynchronized deliveries of the SAME (queryId, batchId) —
    // Spark's at-least-once foreachBatch after a zombie-executor
    // restart. The watermark re-check inside the rebase-retry is what
    // must make them mutually exclusive.
    val threads = handles.map(t => new Thread(() => {
      start.await()
      try results.add(t.appendStream("q", 7L, batch).isDefined)
      catch { case e: Throwable => errors.add(e) }
    }))
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(errors.isEmpty, s"racing delivery failed: ${errors.toArray.mkString("; ")}")
    assert(results.toArray.count(_ == true.asInstanceOf[AnyRef]) == 1,
      "exactly one delivery may commit")
    val reloaded = LakehouseTable.load(spark, dir)
    assert(reloaded.read().count() == 40, "no duplicated rows")
    assert(reloaded.metadata.streamWatermarks("q") == 7L)

    // same guarantee for the MoR upsert variant
    val mor = Seq(LakehouseTable.load(spark, dir), LakehouseTable.load(spark, dir))
    val upsert = mkRows(0 until 10).withColumn("Bid", org.apache.spark.sql.functions.lit(999.0))
    val start2 = new CountDownLatch(1)
    val results2 = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads2 = mor.map(t => new Thread(() => {
      start2.await()
      try results2.add(t.morMergeStream("q", 8L, upsert, Seq("DateTime")).isDefined)
      catch { case e: Throwable => errors.add(e) }
    }))
    threads2.foreach(_.start()); start2.countDown(); threads2.foreach(_.join())
    assert(errors.isEmpty, s"racing upsert failed: ${errors.toArray.mkString("; ")}")
    assert(results2.toArray.count(_ == true.asInstanceOf[AnyRef]) == 1,
      "exactly one upsert delivery may commit")
    val after = LakehouseTable.load(spark, dir)
    assert(after.read().count() == 40, "upsert replaces, never duplicates")
    assert(after.read().filter($"Bid" === 999.0).count() == 10)
  }
}
