package graft.stream

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Online first-seen-wins semantics of the persistent LSH band index:
  * earlier batches poison later duplicates, rejected docs still poison
  * lookalikes, intra-batch ties go to the smaller doc id, and a replayed
  * step is a no-op for both the survivor set and the index contents.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def bands(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("doc_id", "band_id", "band_sig")

  private def fresh(name: String) =
    DedupIndex.createIndex(spark, new Path(tmpDir("dix"), name))

  private def survivors(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("first batch: smallest doc id wins each bucket; disjoint docs all survive") {
    val idx = fresh("a")
    // docs 1,2 share band (0, 100); doc 3 is disjoint
    val s = DedupIndex.step(idx,
      bands((1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 999L)), "q", 1L)
    assert(survivors(s) == Set(1L, 3L))
  }

  test("later batch loses against history, including against REJECTED docs") {
    val idx = fresh("b")
    DedupIndex.step(idx, bands((1L, 0L, 100L), (2L, 0L, 100L), (2L, 1L, 200L)), "q", 1L)
    // doc 5 matches only the signature of doc 2 — which was itself
    // rejected in batch 1. Seen content still poisons: 5 must lose.
    val s2 = DedupIndex.step(idx, bands((5L, 1L, 200L), (6L, 0L, 777L)), "q", 2L)
    assert(survivors(s2) == Set(6L))
  }

  test("a doc sharing ANY band with an earlier doc is dropped") {
    val idx = fresh("c")
    DedupIndex.step(idx, bands((1L, 0L, 100L), (1L, 1L, 101L)), "q", 1L)
    val s = DedupIndex.step(idx,
      bands((2L, 0L, 555L), (2L, 1L, 101L)), "q", 2L) // band 1 collides
    assert(survivors(s).isEmpty)
  }

  test("replayed step returns the original survivors and appends nothing") {
    val idx = fresh("d")
    DedupIndex.step(idx, bands((1L, 0L, 100L)), "q", 1L)
    val orig = DedupIndex.step(idx, bands((2L, 0L, 100L), (3L, 0L, 300L)), "q", 2L)
    val origSet = survivors(orig)
    val rowsAfter = idx.read().count()
    val replay = DedupIndex.step(idx, bands((2L, 0L, 100L), (3L, 0L, 300L)), "q", 2L)
    assert(survivors(replay) == origSet)
    assert(origSet == Set(3L))
    assert(idx.read().count() == rowsAfter)
  }

  test("compaction shrinks to distinct sigs and changes no future or replayed answer") {
    val a = fresh("f1") // compacted after batch 2
    val b = fresh("f2") // control, never compacted
    val b1 = bands((1L, 0L, 10L), (2L, 0L, 10L), (3L, 1L, 20L))
    val b2 = bands((4L, 0L, 10L), (5L, 1L, 20L), (6L, 2L, 60L))
    val b3 = bands((7L, 0L, 10L), (8L, 2L, 60L), (9L, 3L, 90L))
    Seq(a, b).foreach { idx =>
      DedupIndex.step(idx, b1, "q", 1L)
      DedupIndex.step(idx, b2, "q", 2L)
    }
    DedupIndex.compactIndex(a)
    // sig (0,10) was seen 4 times across docs/batches → one row now
    assert(a.read().count() == 3L) // sigs (0,10), (1,20), (2,60)
    assert(survivors(DedupIndex.step(a, b3, "q", 3L)) ==
      survivors(DedupIndex.step(b, b3, "q", 3L)))
    // replayed batch 2 after compaction: same survivors as the control's replay
    assert(survivors(DedupIndex.step(a, b2, "q", 2L)) ==
      survivors(DedupIndex.step(b, b2, "q", 2L)))
    assert(survivors(DedupIndex.step(a, b2, "q", 2L)) == Set(6L))
  }

  test("survivorsBackfill equals per-batch survivorsFromCommitted on settled commits") {
    val idx = fresh("g")
    // cross-batch dups, intra-batch ties, multi-band docs, rejected-doc
    // poisoning — every rule the per-batch probe implements
    val b1 = bands((1L, 0L, 10L), (2L, 0L, 10L), (2L, 1L, 20L), (3L, 2L, 30L))
    val b2 = bands((4L, 1L, 20L), (5L, 0L, 50L), (6L, 0L, 50L), (6L, 3L, 70L))
    val b3 = bands((7L, 3L, 70L), (8L, 4L, 80L))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      DedupIndex.commitBatch(idx, b, "q", i + 1L)
    }
    val committed = idx.read()
    val bulk = DedupIndex.survivorsBackfill(committed)
    (1L to 3L).foreach { b =>
      val perBatch = survivors(DedupIndex.survivorsFromCommitted(
        committed, b, settledBefore = Some(b - 1), priorSettled = true))
      val fromBulk = survivors(
        bulk.filter(org.apache.spark.sql.functions.col("batch") === b))
      assert(fromBulk == perBatch, s"batch $b: bulk $fromBulk != probe $perBatch")
    }
    assert(survivors(bulk) == Set(1L, 3L, 5L, 8L))
  }

  test("incremental equals global: batch-by-batch == one-shot over the union") {
    val idx = fresh("e")
    val all = Seq(
      (1L, 0L, 10L), (2L, 0L, 10L), (3L, 1L, 20L), // b1
      (4L, 1L, 20L), (5L, 0L, 50L), (6L, 2L, 60L), // b2
      (7L, 0L, 50L), (8L, 2L, 60L), (9L, 3L, 90L)) // b3
    val got = (0 until 3).flatMap { b =>
      val slice = all.slice(b * 3, b * 3 + 3)
      survivors(DedupIndex.step(idx, bands(slice: _*), "q", b + 1L))
    }.toSet
    // global: doc survives iff no smaller doc shares a band
    val byBucket = all.groupBy(r => (r._2, r._3))
    val global = all.map(_._1).filter { d =>
      all.filter(_._1 == d).forall { r =>
        byBucket((r._2, r._3)).forall(_._1 >= d)
      }
    }.toSet
    assert(got == global)
    assert(got == Set(1L, 3L, 5L, 6L, 9L))
  }
}
