package graft.ops

import graft.SparkSpec

/** [[Dsir]] — importance-resampling data selection: target-like
  * documents must outscore off-target ones, selection is deterministic
  * top-k, and featureless documents score exactly 0.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target distribution: pet-care text; off-target: finance text
  private val target = Seq(
    "the cat sat on the mat",
    "a dog chased the cat",
    "the dog and the cat play",
    "cat food and dog food"
  ).toDF("text")

  private val corpus = Seq(
    (0L, "the cat and the dog sat"),
    (1L, "dog food for the cat"),
    (2L, "quarterly revenue rose sharply"),
    (3L, "the market priced bonds lower"),
    (4L, "a cat play day"),
    (5L, "bond yields and market risk")
  ).toDF("doc_id", "text")

  test("target-like documents outscore off-target documents") {
    val s = Dsir.scores(corpus, target, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val petIds = Seq(0L, 1L, 4L)
    val finIds = Seq(2L, 3L, 5L)
    assert(petIds.map(s).min > finIds.map(s).max,
      s"every pet doc must outscore every finance doc, got $s")
  }

  test("select returns the deterministic top-k with ranks") {
    val sel = Dsir.select(corpus, target, k = 3, buckets = 1024).collect()
    assert(sel.length == 3)
    assert(sel.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
    assert(sel.map(_.getLong(0)).toSet == Set(0L, 1L, 4L),
      s"top-3 must be the pet docs, got ${sel.mkString(", ")}")
    // rank order follows score desc, id asc — re-running is identical
    val again = Dsir.select(corpus, target, k = 3, buckets = 1024).collect()
    assert(sel.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("a featureless document scores exactly zero and is retained") {
    val withEmpty = corpus.union(Seq((9L, "")).toDF("doc_id", "text"))
    val s = Dsir.scores(withEmpty, target, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(9L) == 0.0)
    assert(s.size == 7)
  }
}
