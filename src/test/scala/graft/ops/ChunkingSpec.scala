package graft.ops

import graft.SparkSpec

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
}
