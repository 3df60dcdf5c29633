package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-corpus line dedup (C4/CCNet boilerplate removal): token
  * segmentation shapes, doc-frequency filtering semantics, and ordered
  * reassembly.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("segmentTokenLines chunks tokens and keeps a short tail line") {
    val docs = Seq((1L, (1 to 17).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val lines = DedupOps.segmentTokenLines(docs, tokensPerLine = 8)
      .orderBy("line_no").collect()
    assert(lines.length == 3)
    assert(lines(0).getString(2) == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(lines(2).getString(2) == "t17", "tail line carries the remainder")
    assert(lines.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("empty and whitespace-only docs yield no lines (no sequence() blowup)") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val lines = DedupOps.segmentTokenLines(docs, tokensPerLine = 2)
    assert(lines.count() == 1)
    assert(lines.select("doc_id").head().getLong(0) == 3L)
  }

  test("dropDuplicatedLines removes cross-doc lines but keeps within-doc repeats") {
    val lines = Seq(
      (1L, 0L, "shared boilerplate"),
      (1L, 1L, "unique to one"),
      (2L, 0L, "shared boilerplate"),
      (2L, 1L, "unique to two"),
      (3L, 0L, "self repeat"),
      (3L, 1L, "self repeat") // same doc twice: df = 1, must survive
    ).toDF("doc_id", "line_no", "line")

    val kept = DedupOps.dropDuplicatedLines(lines, maxDocFreq = 1)
      .select("doc_id", "line").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!kept.exists(_._2 == "shared boilerplate"), "df=2 line must drop")
    assert(kept.count(_._2 == "self repeat") == 1, "set of (doc, line) pairs")
    assert(DedupOps.dropDuplicatedLines(lines, maxDocFreq = 1).count() == 4)

    assert(DedupOps.dropDuplicatedLines(lines, maxDocFreq = 2).count() == 6,
      "raising the threshold keeps the shared line")
  }

  test("dropDuplicatedLines drops NULL lines (oracle join semantics) and " +
    "refuses reserved temp columns") {
    val lines = Seq(
      (Some(1L), 0L, Some("keep me")),
      (Some(1L), 1L, None: Option[String]),
      (Some(2L), 0L, None: Option[String])
    ).toDF("doc_id", "line_no", "line")
    // pre-r18 semi-join and the declared oracle SQL (JOIN dfreq USING
    // (line)) both drop null lines; pinned so the window form can never
    // silently keep them on a future corpus
    val kept = DedupOps.dropDuplicatedLines(lines, maxDocFreq = 1)
      .select("line").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("keep me"))
    // a caller column colliding with the internal temp names must fail
    // loudly instead of being silently overwritten and dropped
    val clash = lines.withColumn("__graft_line_df", lit(1L))
    intercept[IllegalArgumentException] {
      DedupOps.dropDuplicatedLines(clash, maxDocFreq = 1)
    }
  }

  test("reassembleLines restores line order regardless of input order") {
    val lines = Seq(
      (1L, 2L, "three"), (1L, 0L, "one"), (1L, 1L, "two")
    ).toDF("doc_id", "line_no", "line")
    val out = DedupOps.reassembleLines(lines).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "one two three")
  }

  test("dedupLinesTokenized end-to-end: boilerplate vanishes, content stays") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupLinesTokenized(docs, tokensPerLine = 8, maxDocFreq = 1)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(1).getString(1) == "iota kappa lambda mu nu xi omicron pi")
  }

  test("removeIntraDocRepetition keeps the first occurrence of a within-doc repeat") {
    // doc 1 repeats "a b" (lines 0 and 2); doc 2 shares "a b" with doc 1
    // but has no internal repeat — cross-doc presence must NOT drop it
    val docs = Seq(
      (1L, "a b c d a b e f"),
      (2L, "a b x y")).toDF("doc_id", "text")
    val out = DedupOps.removeIntraDocRepetition(docs, tokensPerLine = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, "a b c d e f"), // second "a b" removed, order preserved
      (2L, "a b x y")))    // untouched: intra-doc dedup is doc-local
  }

  test("gopherFilter drops short, low-diversity and repetitive docs") {
    val good = (1 to 40).map(i => s"w$i").mkString(" ") // diverse, long enough
    val short = "one two three"
    val stuffed = (("spam " * 30) + (1 to 20).map(i => s"x$i").mkString(" ")).trim
    val docs = Seq((1L, good), (2L, short), (3L, stuffed)).toDF("doc_id", "text")
    val kept = TextAnalysis.gopherFilter(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"expected only the good doc, got $kept")
  }

  test("redactPii scrubs emails, IPs and phones but not lookalikes") {
    val df = Seq(
      "mail a.b-c@ex.co now",
      "host 192.168.0.1 up",
      "call +44-555-12345 now",
      "version 1.2.3 unchanged",
      "a.10.0.0.1@ex.co is one email"
    ).toDF("t").select(TextAnalysis.redactPii(col("t")).as("r"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "host <IP> up")
    assert(got(2) == "call <PHONE> now")
    assert(got(3) == "version 1.2.3 unchanged", "a 3-part version is not an IP")
    assert(got(4) == "<EMAIL> is one email", "email pass must run before the IP pass")
  }
}
