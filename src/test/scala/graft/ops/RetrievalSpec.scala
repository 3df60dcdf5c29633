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

  test("overlapTopK ranks by distinct matched terms, ties to lower doc id") {
    val post = Retrieval.postings(corpus, "doc_id", "text")
    val rows = Retrieval.overlapTopK(post, "doc_id", Seq((0L, "spark window merge")), topK = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: spark+merge=2; doc 1: spark+window=2; doc 2: window+merge=2; doc 3: 0
    // all tie at overlap 2 → doc-id order; duplicate terms inside a doc count once
    assert(rows.toSeq == Seq((0L, 1L, 2L), (1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("rrfFuse sums 1/(60+rank) across lists; docs on both lists outrank single-list docs") {
    import spark.implicits._
    // hand-built rank lists: doc 10 is rank 2 on BOTH lists,
    // doc 11 is rank 1 on only one — fusion must put 10 first
    // (1/62 + 1/62 = 0.032258 > 1/61 = 0.016393)
    val a = Seq((0L, 11L, 1L), (0L, 10L, 2L)).toDF("q_id", "doc_id", "rnk")
    val b = Seq((0L, 12L, 1L), (0L, 10L, 2L)).toDF("q_id", "doc_id", "rnk")
    val fused = Retrieval.rrfFuse(Seq(a, b), "doc_id", topK = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fused.map(_._1).toSeq == Seq(10L, 11L, 12L))
    // exact scaled-long arithmetic: round(1e6/62)*2 = 32258, round(1e6/61) = 16393
    assert(fused(0)._3 == 0.032258 && fused(1)._3 == 0.016393)
    // equal-score ties (docs 11 and 12, both rank-1 on one list) break to lower id
    assert(fused(1)._1 < fused(2)._1 && fused(1)._3 == fused(2)._3)
  }

  test("fusion pipeline is deterministic and touches no corpus after the lists") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val qs = Seq((0L, "spark window merge"), (1L, "customer join agg"))
    val post = Retrieval.postings(docs, "doc_id", "text")
    def run() = Retrieval.rrfFuse(
      Seq(Retrieval.searchPostings(post, "doc_id", qs, topK = 10),
        Retrieval.overlapTopK(post, "doc_id", qs, topK = 10)),
      "doc_id", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(run() == run())
    assert(run().nonEmpty)
  }
}
