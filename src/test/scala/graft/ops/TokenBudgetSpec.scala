package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-ordered selection under a token budget: the two-level prefix
  * sum must equal the naive global window for any bucket count.
  */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (id, score, n_tokens encoded as that many 'x' words)
    (1L, 10.0, 5), (2L, 8.0, 3), (3L, 8.0, 4), (4L, 6.0, 2), (5L, 1.0, 7))
    .map { case (id, sc, n) => (id, sc, Seq.fill(n)("x").mkString(" ")) }
    .toDF("doc_id", "score", "text")

  private def select(budget: Long, nBuckets: Int) =
    Curation.selectByTokenBudget(docs, "doc_id", "score",
        TextAnalysis.tokenCount(col("text")), budget, nBuckets)
      .select("doc_id", "cum_tokens").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("greedy prefix in (score desc, id asc) order; ties break on id") {
    // order: 1(5) 2(3) 3(4) 4(2) 5(7); cums 5 8 12 14 21
    assert(select(12L, 16) == Seq((1L, 5L), (2L, 8L), (3L, 12L)))
    assert(select(13L, 16) == Seq((1L, 5L), (2L, 8L), (3L, 12L)))
    assert(select(14L, 16) == Seq((1L, 5L), (2L, 8L), (3L, 12L), (4L, 14L)))
    assert(select(4L, 16) == Nil) // first doc alone exceeds the budget
  }

  test("bucket scheme never changes the answer") {
    val expected = select(14L, 256)
    Seq(1, 2, 3, 5, 64).foreach(b =>
      assert(select(14L, b) == expected, s"nBuckets=$b diverged"))
  }

  test("uniform scores (zero-width range) and empty input degrade cleanly") {
    val flat = Seq((1L, 1.0, "a b"), (2L, 1.0, "c"), (3L, 1.0, "d e f"))
      .toDF("doc_id", "score", "text")
    val out = Curation.selectByTokenBudget(flat, "doc_id", "score",
        TextAnalysis.tokenCount(col("text")), 3L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L)) // ids ascending within the tied score: 2+1 <= 3
    val empty = Curation.selectByTokenBudget(flat.limit(0), "doc_id", "score",
      TextAnalysis.tokenCount(col("text")), 3L)
    assert(empty.count() == 0L && empty.columns.contains("cum_tokens"))
  }
}
