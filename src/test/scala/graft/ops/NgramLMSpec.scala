package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLMSpec extends SparkSpec {

  private def ref = {
    import spark.implicits._
    // bigrams: (a,b)x2, (b,a)x1, (b,c)x1, (c,a)x1 ; V = 3
    Seq((0L, "a b a b c a"), (1L, "b")).toDF("doc_id", "text")
  }

  test("fit counts bigrams, start totals, and vocab") {
    val m = NgramLM.fitBigrams(ref)
    val bi = m.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L, ("c", "a") -> 1L))
    val starts = m.starts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(starts == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(m.vocab.collect()(0).getLong(0) == 3L)
  }

  test("scorePerplexity matches a driver-side recomputation") {
    import spark.implicits._
    val m = NgramLM.fitBigrams(ref)
    // doc bigrams: (a,b) seen 2x/starts 2, (b,x) unseen w2, (x,a) unseen w1
    val doc = Seq((9L, "a b x a")).toDF("doc_id", "text")
    val got = NgramLM.scorePerplexity(doc, m).collect()(0)
    val v = 3.0
    val expScaled = Seq(
      math.round(math.log((2.0 + 1.0) / (2.0 + v)) * 10000.0), // (a,b)
      math.round(math.log(1.0 / (2.0 + v)) * 10000.0),         // (b,x) backoff
      math.round(math.log(1.0 / v) * 10000.0))                 // (x,a) unknown w1
    val want = -(expScaled.sum.toDouble / 3.0 / 10000.0)
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(2) == want, s"got ${got.getDouble(2)} want $want")
  }

  test("a doc of fully unknown tokens scores exactly -ln(1/V)") {
    import spark.implicits._
    val m = NgramLM.fitBigrams(ref)
    val doc = Seq((9L, "x y z")).toDF("doc_id", "text")
    val got = NgramLM.scorePerplexity(doc, m).collect()(0).getDouble(2)
    val per = math.round(math.log(1.0 / 3.0) * 10000.0)
    assert(got == -(per * 2.0 / 2.0 / 10000.0))
  }

  test("docs under two tokens are unscoreable and absent") {
    import spark.implicits._
    val m = NgramLM.fitBigrams(ref)
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = NgramLM.scorePerplexity(docs, m).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }

  test("in-distribution text scores below off-distribution text") {
    import spark.implicits._
    // reference with a strongly peaked bigram distribution
    val trained = NgramLM.fitBigrams(
      Seq((0L, "a b a b a b a b a b c d"), (1L, "a b a b a b e f")).toDF("doc_id", "text"))
    val probe = Seq(
      (0L, "a b a b a b"), // the dominant pattern
      (1L, "d c f e b a"), // known tokens, never-seen transitions
      (2L, "q r s t u v")  // unknown vocabulary
    ).toDF("doc_id", "text")
    val nll = NgramLM.scorePerplexity(probe, trained)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(0L) < nll(1L),
      s"dominant pattern should beat unseen transitions: $nll")
  }

  test("deterministic across runs") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val m = NgramLM.fitBigrams(docs.filter(col("lang") === "en"))
    def run() = NgramLM.scorePerplexity(docs, m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }
}
