package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, overlap: Int) =
    Chunking.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", window, overlap)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))

  test("overlapping windows cover every token with the declared stride") {
    val out = chunksOf("a b c d e f g", window = 4, overlap = 2)
    assert(out.toSeq == Seq(
      (0L, "a b c d", 4L),
      (1L, "c d e f", 4L), // starts at stride 2
      (2L, "e f g", 3L), // final chunk short, never empty
      (3L, "g", 1L)))
  }

  test("short documents yield one full chunk; empty documents none") {
    assert(chunksOf("x y", window = 16, overlap = 4).toSeq == Seq((0L, "x y", 2L)))
    assert(chunksOf("", window = 16, overlap = 4).isEmpty)
    assert(chunksOf("   ", window = 16, overlap = 4).isEmpty)
  }

  test("zero overlap partitions the tokens exactly") {
    val out = chunksOf("a b c d e", window = 2, overlap = 0)
    assert(out.map(_._2).toSeq == Seq("a b", "c d", "e"))
    // token conservation: sum of chunk sizes equals document tokens
    assert(out.map(_._3).sum == 5L)
  }

  test("packSequences crosses document boundaries; last block short") {
    val docs = Seq(
      (10L, "a b c"),
      (20L, "d e"),
      (30L, ""),          // empty doc: occupies no positions
      (40L, "f g h i j")
    ).toDF("doc_id", "text")
    val got = Chunking.packSequences(docs, "doc_id", "text", blockSize = 4)
      .orderBy("block_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, "a b c d", 4L),   // doc 10 + start of doc 20
      (1L, "e f g h", 4L),   // doc 20 tail + doc 40
      (2L, "i j", 2L)))
  }

  test("packSequences is invariant to bucketing and partitioning") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def run(buckets: Int, parts: Int) =
      Chunking.packSequences(docs.repartition(parts), "doc_id", "text",
          blockSize = 128, nBuckets = buckets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val a = run(1, 3)
    assert(a == run(7, 11))
    assert(a.nonEmpty)
    // every block except the single last one is exactly full
    val short = a.filter(_._3 != 128L)
    assert(short.size <= 1 && short.forall(_._1 == a.map(_._1).max))
    // token conservation across the whole corpus
    import org.apache.spark.sql.functions.{col, filter, length, size, split, sum}
    val total = docs.select(
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(a.toSeq.map(_._3).sum == total)
  }

  test("packSequences on an empty corpus is empty") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Chunking.packSequences(docs, "doc_id", "text", 8).collect().isEmpty)
  }

  test("contentDefinedChunks partitions every token exactly once, in order") {
    val text = (0 until 120).map(i => s"w${(i * 7) % 23}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.contentDefinedChunks(docs, "doc_id", "text", k = 3, modulus = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(chunks.length > 1, "modulus 4 over 120 tokens must cut somewhere")
    assert(chunks.map(_._1).toSeq == chunks.indices.map(_.toLong), "dense chunk ids")
    assert(chunks.map(_._2).mkString(" ") == text, "concatenation restores the doc")
    assert(chunks.map(_._3).sum == 120L)
  }

  test("contentDefinedChunks boundaries are edit-stable (the property position chunking lacks)") {
    val base = (0 until 150).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "prefix tokens added up front " + base))
      .toDF("doc_id", "text")
    def chunksOf(id: Long) = Chunking
      .contentDefinedChunks(docs.filter(col("doc_id") === id), "doc_id", "text",
        k = 3, modulus = 4)
      .orderBy("chunk_id").collect().map(_.getString(2)).toSeq
    val orig = chunksOf(1L)
    val edited = chunksOf(2L)
    assert(orig.length > 2)
    // every chunk of the original past its FIRST boundary reappears
    // verbatim in the prefixed document: boundaries realign on content
    // within one chunk of the edit. Fixed-size chunking (chunkTokens)
    // shifts every chunk after the edit — assert the contrast.
    val stable = orig.drop(1)
    assert(stable.forall(edited.contains),
      s"content-defined chunks must survive a prefix edit:\n$orig\nvs\n$edited")
    val fixedOrig = Chunking.chunkTokens(docs.filter(col("doc_id") === 1L),
      "doc_id", "text", window = 4, overlap = 0).collect().map(_.getString(2)).toSet
    val fixedEdited = Chunking.chunkTokens(docs.filter(col("doc_id") === 2L),
      "doc_id", "text", window = 4, overlap = 0).collect().map(_.getString(2)).toSet
    assert((fixedOrig -- fixedEdited).size > fixedOrig.size / 2,
      "position-based chunks should mostly NOT survive the same edit (5-token prefix shift)")
  }

  test("dedupContentChunks removes a shared passage that sits at DIFFERENT offsets") {
    // the motivating case: two docs carry the same 60-token passage at
    // different positions — fixed-size chunking cuts it at different
    // alignments per doc (duplicates never collide); content-defined
    // chunks realign, so keep-first removes the second copy
    val passage = (0 until 60).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $passage z1 z2"),
      (2L, s"b1 b2 b3 b4 b5 b6 b7 $passage y1")).toDF("doc_id", "text")
    val out = DedupOps.dedupContentChunks(docs, "doc_id", "text", k = 3, modulus = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val doc2 = out(2L)
    // doc 2 keeps its unique head/tail but loses the interior of the
    // shared passage (boundary chunks may differ — they span the splice)
    assert(doc2.contains("b1"), "doc 2's unique prefix survives")
    val interior = (20 until 40).map(i => s"p$i")
    assert(!interior.forall(doc2.split(" ").contains),
      s"the shared passage interior must dedup out of doc 2, got: $doc2")
    // doc 1 (the keep-first winner) keeps the full passage
    assert((0 until 60).map(i => s"p$i").forall(out(1L).split(" ").contains))
  }

  test("dedupContentChunks keep-first is a combinable aggregate, not a hot-key window") {
    // pathological corpus: ONE boilerplate chunk in every document —
    // under the former row_number window all 200 occurrences sorted on
    // a single task; the aggregate form partial-combines them map-side
    // (VERDICT r11 #2)
    val boiler = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = (1L to 200L).map(d => (d, s"u${d}a u${d}b u${d}c $boiler"))
      .toDF("doc_id", "text").repartition(8)
    val out = DedupOps.dedupContentChunks(docs, "doc_id", "text", k = 3, modulus = 4)
    // plan shape: the only windows are the chunker's own DOC-LOCAL
    // prefix sums — nothing windows on the chunk text (the hot key);
    // keep-first runs as a two-phase hash aggregate, so per-reduce-
    // group input is bounded by the map task count, not the occurrence
    // count
    val windows = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(w => w.partitionSpec.exists(
        _.references.exists(_.name == "doc_id")) &&
        !w.partitionSpec.exists(_.references.exists(_.name == "text"))),
      s"keep-first must not window on chunk text:\n" +
        windows.map(_.partitionSpec.mkString(", ")).mkString("\n"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("partial_min"),
      s"expected a partial+final hash-aggregate keep-first:\n$plan")
    // value shape: doc 1 keeps the boilerplate interior, every later
    // doc keeps its unique tokens and loses the shared chunk's interior
    val byDoc = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.size == 200)
    assert((0 until 30).map(i => s"w$i").count(byDoc(1L).split(" ").contains) >= 25,
      s"keep-first winner must retain the passage: ${byDoc(1L)}")
    val interior = (10 until 20).map(i => s"w$i")
    assert((2L to 200L).forall(d => !interior.forall(byDoc(d).split(" ").contains)),
      "every non-first doc must lose the shared chunk interior")
    assert((2L to 200L).forall(d => byDoc(d).contains(s"u${d}a")),
      "unique content always survives")
  }
}
