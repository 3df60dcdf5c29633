package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "spark merge spark spark"),       // dl=4, tf(spark)=3
      (1L, "spark window"),                  // dl=2, tf(spark)=1
      (2L, "window merge window agg table"), // dl=5, no spark
      (3L, "the a of")                       // dl=3, no query terms
    ).toDF("doc_id", "text")
  }

  test("postings emits (doc, term, tf, dl) with one row per distinct doc-term") {
    val post = Retrieval.postings(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(post((0L, "spark")) == ((3L, 4L)))
    assert(post((0L, "merge")) == ((1L, 4L)))
    assert(post((1L, "window")) == ((1L, 2L)))
    assert(post((2L, "window")) == ((2L, 5L)))
    assert(post.size == 2 + 2 + 4 + 3)
  }

  /** Driver-side BM25 recomputation with the same formula/rounding — an
    * independent implementation the distributed result must match exactly.
    */
  private def expectedScores(
      docs: Seq[(Long, String)],
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size.toDouble
    val sdl = toks.values.map(_.size).sum.toDouble
    val qts = query.split(" ").filter(_.nonEmpty).toSet
    docs.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      val scaled = qts.toSeq.flatMap { term =>
        val tf = toks(id).count(_ == term).toDouble
        if (tf == 0) None
        else {
          val df = docs.count { case (_, t) => t.split(" ").contains(term) }.toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          val tfPart = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * (dl / (sdl / n))))
          Some(math.round(idf * tfPart * 10000.0))
        }
      }.sum
      if (scaled == 0L) None else Some(id -> scaled / 10000.0)
    }.toMap
  }

  test("bm25TopK matches a driver-side recomputation exactly") {
    val docs = Seq(
      (0L, "spark merge spark spark"),
      (1L, "spark window"),
      (2L, "window merge window agg table"),
      (3L, "the a of"))
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq((7L, "spark merge")), topK = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val want = expectedScores(docs, "spark merge")
    assert(got == want, s"got $got want $want")
  }

  test("ranking: higher tf beats lower, absent terms score nothing, ties break to lower id") {
    val rows = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq((0L, "spark")), topK = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    // doc 0 has tf=3 (dl 4), doc 1 tf=1 (dl 2); docs 2,3 lack the term entirely
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    // duplicate query terms count once: "spark spark" == "spark"
    val dup = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq((0L, "spark spark")), topK = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(dup.toSeq == rows.toSeq)
  }

  test("search probes broadcast onto the postings (no shuffled query-side join)") {
    val res = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq((0L, "spark merge")), topK = 5)
    res.collect() // finalize the adaptive plan before inspecting it
    val plan = res.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected qterms and df to broadcast-join the postings, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"query-side probes must never shuffle the postings:\n$plan")
  }

  test("deterministic across runs on the real corpus") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run() = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "spark window merge"), (1L, "customer join agg")), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run() == run())
  }
}
