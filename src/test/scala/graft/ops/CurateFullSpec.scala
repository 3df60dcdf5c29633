package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateFullSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int) = (1 to n).map(i => s"w$seed$i").mkString(" ")

  // 10-token passage shared by docs 1 and 2 at DIFFERENT offsets: the
  // 8-token line grids disagree (line dedup spares it) and the 3-gram
  // Jaccard is ~0.1 (near-dup spares it) — only the sliding-window span
  // stage can catch it.
  private val passage = (1 to 10).map(i => s"p$i").mkString(" ")

  private def corpus = Seq(
    (1L, s"${words("a", 5)} $passage ${words("b", 25)}", "en"),
    (2L, s"${words("c", 6)} $passage ${words("d", 24)}", "en"),
    (3L, words("e", 40), "en"),
    (4L, (1 to 40).map(i => s"zz$i").mkString(" "), "xx") // off-distribution
  ).toDF("doc_id", "text", "lang")

  test("span stage masks the misaligned shared passage; LM stage drops the off-distribution doc") {
    val out = Curation.curateCorpusFull(corpus, maxAvgNll = 4.2)
    val byId = out.frame.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.release()
    assert(byId.keySet == Set(1L, 2L, 3L), s"got ${byId.keySet}")
    assert(!byId(1L).contains("p1") && !byId(2L).contains("p1"),
      "shared passage masked from both carriers")
    assert(byId(1L).contains("wa1") && byId(1L).contains("wb1"),
      "unique content around the masked passage survives")
  }

  test("an infinite threshold keeps every scoreable survivor (LM stage is the only difference)") {
    val all = Curation.curateCorpusFull(corpus, maxAvgNll = Double.MaxValue)
    val ids = all.frame.select("doc_id").collect().map(_.getLong(0)).toSet
    all.release()
    assert(ids == Set(1L, 2L, 3L, 4L))
  }

  test("deterministic end to end on the real corpus") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run() = {
      val c = Curation.curateCorpusFull(docs, nearDupBlockCol = Some("source"),
        maxAvgNll = 3.55)
      val r = c.frame.collect().map(x => (x.getLong(0), x.getString(1))).toSet
      c.release()
      r
    }
    val a = run()
    assert(a == run())
    assert(a.nonEmpty)
  }

  test("release frees all persisted diamonds") {
    val c = Curation.curateCorpusFull(corpus, maxAvgNll = 4.2)
    c.frame.count()
    def live() = spark.sparkContext.getPersistentRDDs.size
    // the CC loop's final-round checkpoint residue stays by design (the
    // Bench/session sweep owns it — see connectedComponents scaladoc);
    // release() must drop exactly the three pipeline diamonds (the
    // gate+redact projection, the cleaned corpus, the span-masked
    // survivors)
    val before = live()
    assert(before >= 3, s"expected the three diamonds persisted pre-release, got $before")
    c.release()
    val deadline = System.nanoTime() + 10_000_000_000L
    while (live() > before - 3 && System.nanoTime() < deadline) Thread.sleep(100)
    assert(live() == before - 3,
      s"expected release to free the three diamonds ($before -> ${before - 3}), got ${live()}")
  }
}
