package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  private val passage = "one two three four five six seven eight" // 8 tokens

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, s"alpha beta $passage gamma delta"),           // passage at offset 2
      (1L, s"$passage zeta eta theta iota kappa lambda"), // passage at offset 0
      (2L, "mu nu xi omicron pi rho sigma tau upsilon"),  // unique, >= window
      (3L, "short doc here")                              // < window
    ).toDF("doc_id", "text")
  }

  test("a passage shared by two docs at different offsets is masked from both") {
    val out = DedupOps.maskDuplicatedSpans(corpus, window = 8, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((0L, "alpha beta gamma delta", 8L)))
    assert(out(1) == ((1L, "zeta eta theta iota kappa lambda", 8L)))
    assert(out(2) == ((2L, "mu nu xi omicron pi rho sigma tau upsilon", 0L)))
    assert(out(3) == ((3L, "short doc here", 0L)))
  }

  test("overlapping duplicated spans mask the union of their coverage") {
    import spark.implicits._
    // 10-token shared passage => three sliding 8-windows, coverage is the
    // union = all 10 tokens
    val long = s"$passage nine ten"
    val docs = Seq(
      (0L, s"aa bb $long cc"),
      (1L, s"$long dd ee ff gg")).toDF("doc_id", "text")
    val out = DedupOps.maskDuplicatedSpans(docs, window = 8, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((0L, "aa bb cc", 10L)))
    assert(out(1) == ((1L, "dd ee ff gg", 10L)))
  }

  test("null doc ids contribute 0 to span doc-frequency (count-distinct semantics)") {
    import spark.implicits._
    // the shared passage occurs in ONE real doc and one null-id row: df
    // must read 1 (count(DISTINCT doc_id) ignores nulls — the oracle's
    // semantics, pinned for the r19 window rewrite), so nothing masks
    val docs = Seq(
      (Some(0L), s"aa bb $passage cc"),
      (None: Option[Long], s"$passage dd ee"))
      .toDF("doc_id", "text")
    val out = DedupOps.maskDuplicatedSpans(docs, window = 8, minDocs = 2)
      .filter(col("doc_id").isNotNull).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, s"aa bb $passage cc", 0L)))
  }

  test("minDocs=3 spares a span shared by only two docs") {
    val out = DedupOps.maskDuplicatedSpans(corpus, window = 8, minDocs = 3)
      .agg(sum("n_masked")).collect()(0).getLong(0)
    assert(out == 0L)
  }

  test("keepFirst exempts the smallest-id doc's copy; later copies still mask") {
    val out = DedupOps.maskDuplicatedSpans(corpus, window = 8, minDocs = 2,
        keepFirst = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 0 owns the shared passage (smallest id) and keeps it
    assert(out(0) == ((0L, s"alpha beta $passage gamma delta", 0L)))
    assert(out(1) == ((1L, "zeta eta theta iota kappa lambda", 8L)))
    assert(out(2) == ((2L, "mu nu xi omicron pi rho sigma tau upsilon", 0L)))
  }

  test("keepFirst masks an owner's token when an overlapping span is owned elsewhere") {
    import spark.implicits._
    // doc 1 owns no 8-window of its own: every window it carries also
    // exists in doc 0 (a strict superstring), so ownership of all
    // shared windows goes to doc 0 — doc 1 is fully masked, doc 0 kept
    val long = s"$passage nine ten"
    val docs = Seq(
      (0L, s"aa bb $long cc"),
      (1L, long)).toDF("doc_id", "text")
    val out = DedupOps.maskDuplicatedSpans(docs, window = 8, minDocs = 2,
        keepFirst = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((0L, s"aa bb $long cc", 0L)))
    assert(out(1) == ((1L, "", 10L)))
  }

  test("whitespace normalization is the only change for untouched docs") {
    import spark.implicits._
    val docs = Seq((0L, "a  b   c"), (1L, "d e")).toDF("doc_id", "text")
    val out = DedupOps.maskDuplicatedSpans(docs, window = 8, minDocs = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("a b c", "d e"))
  }

  test("deterministic on the real corpus") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run() = DedupOps.maskDuplicatedSpans(docs, window = 8, minDocs = 2)
      .select("doc_id", "text", "n_masked")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val a = run()
    assert(a == run())
    // the sf0.001 corpus has planted duplicate docs — some masking happens
    assert(a.exists(_._3 > 0L), "expected at least one masked span in testdata")
  }
}
