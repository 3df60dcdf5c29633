package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline: every stage visibly does its job on
  * a corpus planted with one violation per stage, and the whole run is
  * deterministic (two executions, byte-identical output).
  */
class CurateCorpusSpec extends SparkSpec {
  import spark.implicits._

  // diverse filler so quality signals pass for the "good" docs
  private def words(seed: Int, n: Int) = (1 to n).map(i => s"w${seed}x$i").mkString(" ")

  private val boiler = (1 to 8).map(i => s"nav$i").mkString(" ")

  private def corpus = Seq(
    (1L, s"$boiler ${words(1, 40)}"),                  // good + shared boilerplate line
    (2L, s"$boiler ${words(2, 40)}"),                  // good + shared boilerplate line
    (3L, s"${words(3, 40)} mail me at a@b.co today ok"), // good, carries PII
    (4L, "too short to keep"),                          // killed by the quality gate
    (5L, ("spam " * 40).trim),                          // killed by repetition caps
    // near-dup pair: one-token offset keeps the 8-token line grids
    // disjoint (so LINE dedup leaves both intact) while 3-gram shingle
    // Jaccard stays ~0.95 — exactly the document-level near-dup case
    (6L, s"${words(6, 40)}"),                           // 6 survives (min id)
    (7L, s"pre ${words(6, 40)}"),                       // near-dup of 6: dropped
    (8L, words(8, 40))                                  // plain good doc
  ).toDF("doc_id", "text")

  test("each stage removes exactly its target; survivors are clean") {
    val out = Curation.curateCorpus(corpus, nearDupThreshold = 0.5)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(!byId.contains(4L), "quality gate drops the short doc")
    assert(!byId.contains(5L), "repetition caps drop the stuffed doc")
    assert(!byId.contains(7L), "near-dup keeps only the min-id representative")
    assert(byId.contains(6L))
    assert(byId.keySet == Set(1L, 2L, 3L, 6L, 8L))

    assert(!byId(1L).contains("nav1") && !byId(2L).contains("nav1"),
      "cross-doc boilerplate line removed from both carriers")
    assert(byId(1L).contains("w1x1") && byId(2L).contains("w2x1"),
      "unique content survives line dedup")
    assert(byId(3L).contains("<EMAIL>") && !byId(3L).contains("a@b.co"),
      "PII redacted before anything downstream sees it")
  }

  test("the pipeline is deterministic end to end") {
    val a = Curation.curateCorpus(corpus).orderBy("doc_id").collect().toSeq
    val b = Curation.curateCorpus(corpus).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("sampleRate gates deterministically and nests") {
    val big = (0 until 200).map(i => (i.toLong, words(i, 40))).toDF("doc_id", "text")
    val half = Curation.curateCorpus(big, sampleRate = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quarter = Curation.curateCorpus(big, sampleRate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.size > 50 && half.size < 150, s"~half expected, got ${half.size}")
    assert(quarter.subsetOf(half), "lower-rate samples must nest in higher-rate ones")
  }
}
