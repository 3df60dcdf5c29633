package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Z-order compaction: Morton interleaving math, secondary bounds in
  * the manifest, metadata-level skipping on a non-time column, and
  * result invariance.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave puts bit b of column i at position b*n+i") {
    val df = Seq(1).toDF("x").select(
      ZOrder.interleave(Seq(lit(1L), lit(0L)), 2).as("a"),
      ZOrder.interleave(Seq(lit(0L), lit(1L)), 2).as("b"),
      ZOrder.interleave(Seq(lit(3L), lit(3L)), 2).as("c"),
      ZOrder.interleave(Seq(lit(2L), lit(1L)), 2).as("d"))
    val r = df.head()
    assert(r.getLong(0) == 1L)  // 0b0001
    assert(r.getLong(1) == 2L)  // 0b0010
    assert(r.getLong(2) == 15L) // 0b1111
    assert(r.getLong(3) == 0b0110L, "col0=2 -> bit1@pos2 (4); col1=1 -> bit0@pos1 (2)")
  }

  test("cell clamps nulls and out-of-range values to the edges") {
    val r = Seq(1).toDF("x").select(
      ZOrder.cell(lit(null).cast("double"), 0.0, 10.0, 4).as("n"),
      ZOrder.cell(lit(-5.0), 0.0, 10.0, 4).as("lo"),
      ZOrder.cell(lit(50.0), 0.0, 10.0, 4).as("hi")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 15L)
  }

  private def corpus = {
    // pseudo-random EventId so time order and key order are independent
    (0 until 4000).map { i =>
      (Timestamp.valueOf(f"2024-01-01 ${(i / 60) % 24}%02d:${i % 60}%02d:${(i / 1440) % 60}%02d"),
        (i * 2654435761L) % 4000, i.toDouble)
    }.toSeq.toDF("DateTime", "EventId", "Bid")
  }

  test("z-order tightens secondary bounds vs time-only compaction and skips files") {
    val df = corpus
    def build(name: String): LakehouseTable = {
      val t = LakehouseTable.createIfNotExists(
        spark, new Path(tmpDir("zo"), name), df.schema, Some("DateTime"))
      (0 until 4).foreach(i => t.append(df.filter($"EventId" % 4 === i)))
      t
    }

    val plain = build("plain"); plain.compact(filesPerPartition = 16)
    val zed = build("zed"); zed.compactZOrder(Seq("DateTime", "EventId"), filesPerPartition = 16)

    // results identical to the time-only layout
    val a = plain.read().orderBy("EventId").collect()
    val b = zed.read().orderBy("EventId").collect()
    assert(a.sameElements(b), "layout must never change query results")

    val zf = zed.currentDataFiles
    assert(zf.forall(_.extraBounds.exists(_.exists(_.column == "EventId"))),
      "every z-ordered file records EventId bounds")

    // average EventId span per file: z-order must beat single-key sort,
    // under which a file's EventId range is essentially the full domain
    def avgSpan(fs: Seq[DataFile]): Double = {
      val spans = fs.flatMap(_.extraBounds.flatMap(_.find(_.column == "EventId"))
        .map(b => (b.max - b.min).toDouble))
      if (spans.isEmpty) 4000.0 else spans.sum / spans.size
    }
    assert(avgSpan(zf) < 4000.0 * 0.75,
      s"z-ordered files must have materially tighter EventId spans, got ${avgSpan(zf)}")

    // metadata skipping: a narrow EventId slice plans a strict subset
    val kept = zed.filesOverlappingColumn("EventId", 0L, 249L)
    assert(kept.size < zf.size,
      s"a 1/16 EventId slice must skip files (${kept.size} of ${zf.size} kept)")

    // plain files carry no bounds: nothing skips, nothing breaks
    assert(plain.filesOverlappingColumn("EventId", 0L, 249L).size ==
      plain.currentDataFiles.size)

    // exact read-back through the pruned path
    val expect = df.filter($"EventId" <= 249).count()
    assert(zed.readColumnRange("EventId", 0L, 249L).count() == expect)
    assert(plain.readColumnRange("EventId", 0L, 249L).count() == expect)
  }

  test("maintain with zOrderCols compacts z-ordered and records bounds") {
    val df = corpus
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("zo"), "maint"), df.schema, Some("DateTime"))
    (0 until 6).foreach(i => t.append(df.filter($"EventId" % 6 === i)))
    val report = t.maintain(retentionMs = 0L, zOrderCols = Seq("DateTime", "EventId"),
      compactTo = 8)
    assert(report.compacted, "small-file pressure must trigger the z-order rewrite")
    assert(t.currentDataFiles.forall(
      _.extraBounds.exists(_.exists(_.column == "EventId"))),
      "maintenance compaction must preserve the cluster-column bounds")
    assert(t.read().count() == df.count())
  }

  test("z-order compaction folds pending MoR deletes like plain compaction") {
    val df = corpus.limit(500)
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("zo"), "mor"), df.schema, Some("DateTime"))
    t.append(df)
    t.morDeleteKeys(df.filter($"EventId" < 100).select("EventId"), "EventId")
    val before = t.read().count()
    t.compactZOrder(Seq("DateTime", "EventId"))
    assert(t.currentDeleteFiles.isEmpty)
    assert(t.read().count() == before)
    assert(t.metadata.currentSnapshot.get.totalRows == before)
  }
}
