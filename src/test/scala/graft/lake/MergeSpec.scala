package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(year: Int, ids: Range) =
    ids.map(i => (Timestamp.valueOf(f"$year%d-01-01 00:00:$i%02d"), i.toDouble))
      .toDF("DateTime", "Bid")

  test("merge rewrites only the files containing matched keys") {
    val dir = new Path(tmpDir("merge"), "t")
    val y2020 = rows(2020, 0 until 50)
    val table = LakehouseTable.createIfNotExists(spark, dir, y2020.schema, Some("DateTime"))
    table.append(y2020)
    table.append(rows(2021, 0 until 40))
    val before = table.currentDataFiles
    val untouched = before.filter(_.path.contains("DateTime_year=2021"))
    assert(untouched.nonEmpty)

    // update 10 keys in 2020 (+1000) and insert 5 brand-new 2020 keys
    val updates = rows(2020, 0 until 10).withColumn("Bid", col("Bid") + 1000.0)
      .unionByName(
        (100 until 105).map(i => (Timestamp.valueOf(f"2020-01-01 00:01:${i - 100}%02d"), i.toDouble))
          .toDF("DateTime", "Bid"))
    val preMergeSnap = table.metadata.currentSnapshot.get.id
    table.merge(updates, "DateTime")

    val after = table.metadata.currentSnapshot.get
    val afterFiles = table.dataFiles(after)
    // 2021 files carried over byte-identical (same manifest entries)
    untouched.foreach(f => assert(afterFiles.exists(_.path == f.path)))
    // only the 2020 files CONTAINING matched keys were replaced; 2020
    // files holding untouched keys survive (that's the surgical point)
    val before2020 = before.filter(_.path.contains("DateTime_year=2020"))
    val survived2020 = before2020.count(f => afterFiles.exists(_.path == f.path))
    assert(survived2020 < before2020.size, "no 2020 file was rewritten")

    val df = table.read()
    assert(df.count() === 95L) // 50 + 40 + 5 inserts
    assert(after.totalRows === 95L)
    assert(df.filter($"Bid" >= 1000.0).count() === 10L) // updates applied
    assert(df.filter($"DateTime" === Timestamp.valueOf("2020-01-01 00:00:05"))
      .select("Bid").as[Double].head() === 1005.0)

    // time travel still sees pre-merge values
    val old = table.timeTravel(preMergeSnap)
    assert(old.count() === 90L)
    assert(old.filter($"Bid" >= 1000.0).count() === 0L)
  }

  test("delete rewrites only files containing matches; time travel keeps old data") {
    val dir = new Path(tmpDir("merge"), "t3")
    val y2020 = rows(2020, 0 until 30)
    val table = LakehouseTable.createIfNotExists(spark, dir, y2020.schema, Some("DateTime"))
    table.append(y2020)
    table.append(rows(2021, 0 until 30))
    val before = table.metadata.currentSnapshot.get
    val files2021 = table.dataFiles(before).filter(_.path.contains("DateTime_year=2021"))

    table.delete(year($"DateTime") === 2020 && $"Bid" < 10.0)

    val after = table.metadata.currentSnapshot.get
    val afterFiles = table.dataFiles(after)
    files2021.foreach(f => assert(afterFiles.exists(_.path == f.path))) // untouched
    assert(table.read().count() === 50L) // 30 - 10 + 30
    assert(after.totalRows === 50L)
    assert(table.read().filter(year($"DateTime") === 2020 && $"Bid" < 10.0).count() === 0L)
    assert(table.timeTravel(before.id).count() === 60L) // pre-delete intact
  }

  test("merge discovery prunes on a declared stats-column key") {
    // time-keyed table, upsert key = uid (a declared stats column with
    // a column bloom): files are uid-residue disjoint with fully
    // interleaved uid ranges, so bounds keep all 8 and any discovery
    // drop is the bloom's — the business-key upsert shape that
    // previously scanned every file to find hits
    def part(r: Int) = (0 until 40).map { i =>
      val u = 8 * i + r
      (Timestamp.valueOf(f"2024-01-01 00:00:00.$u%06d"), u.toLong, u.toDouble)
    }.toDF("ts", "uid", "v").coalesce(1)
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("merge-sk"), "t"), part(0).schema, Some("ts"))
    t.setProperty("write.stats-columns", "uid")
    t.setProperty("write.column-bloom.bits", "4096")
    (0 until 8).foreach(r => t.append(part(r)))
    val log = new SnapshotLog(t.tableDir, spark.sessionState.newHadoopConf())
    val refsWithFiles = t.metadata.currentSnapshot
      .map(s => log.readManifestList(s).map(r => r -> log.readManifest(r.path)))
      .getOrElse(Nil)
    // batch touches residue-3 uids only: bounds keep all 8, the bloom
    // probe must drop most of the other residues
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:01.0"), 3L, -1.0),
      (Timestamp.valueOf("2024-01-01 00:00:01.0"), 11L, -2.0)).toDF("ts", "uid", "v")
    val cands = t.mergeCandidates(t.metadata, refsWithFiles, batch, "uid")
    assert(cands.size < 8 && cands.nonEmpty,
      s"stats-column merge discovery must bloom-prune below 8 files, got ${cands.size}")
    // and the merge itself stays exact through the pruned discovery
    t.merge(batch, "uid")
    val df = t.read()
    assert(df.count() == 320L) // both keys existed: updates, no inserts
    assert(df.filter(col("uid") === 3L).select("v").as[Double].head() == -1.0)
    assert(df.filter(col("uid") === 11L).select("v").as[Double].head() == -2.0)
  }

  test("merge discovery prunes on bucket and identity partition sources") {
    // bucket[4] on uid: candidates focus to the batch's bucket dirs
    val data = (0 until 64).map(i => (i.toLong, i.toDouble)).toDF("uid", "v")
    val tb = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("merge-bk"), "t"), data.schema,
      Seq("uid" -> "bucket[4]"))
    tb.append(data)
    val logB = new SnapshotLog(tb.tableDir, spark.sessionState.newHadoopConf())
    val refsB = tb.metadata.currentSnapshot
      .map(s => logB.readManifestList(s).map(r => r -> logB.readManifest(r.path)))
      .getOrElse(Nil)
    val batchB = Seq((5L, -5.0)).toDF("uid", "v")
    val candsB = tb.mergeCandidates(tb.metadata, refsB, batchB, "uid")
    val totalB = refsB.flatMap(_._2).size
    assert(candsB.size < totalB,
      s"bucket merge discovery must keep only the key's bucket dirs ($candsB of $totalB)")
    tb.merge(batchB, "uid")
    assert(tb.read().filter(col("uid") === 5L).select("v").as[Double].head() == -5.0)
    assert(tb.read().count() == 64L)

    // identity on sym: candidates focus to the batch's symbols
    val rows = (0 until 80).map(i => (s"s${i % 4}", i.toLong, i.toDouble))
      .toDF("sym", "uid", "v")
    val ti = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("merge-id"), "t"), rows.schema,
      Seq("sym" -> "identity"))
    ti.append(rows.coalesce(1))
    val logI = new SnapshotLog(ti.tableDir, spark.sessionState.newHadoopConf())
    val refsI = ti.metadata.currentSnapshot
      .map(s => logI.readManifestList(s).map(r => r -> logI.readManifest(r.path)))
      .getOrElse(Nil)
    val batchI = Seq(("s2", 99L, -9.0)).toDF("sym", "uid", "v")
    val candsI = ti.mergeCandidates(ti.metadata, refsI, batchI, "sym")
    assert(candsI.size == 1,
      s"identity merge discovery must keep only s2's file, got ${candsI.size}")
  }

  test("merge into an empty table is a plain insert") {
    val dir = new Path(tmpDir("merge"), "t2")
    val data = rows(2020, 0 until 20)
    val table = LakehouseTable.createIfNotExists(spark, dir, data.schema, Some("DateTime"))
    table.merge(data, "DateTime")
    assert(table.read().count() === 20L)
    assert(table.snapshots.head.operation === "merge")
  }
}
