package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer: deterministic merge learning over word-type counts,
  * codegen subword encoding, lossless reconstruction.
  */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("textbook merge order on a hand-checkable dict") {
    // classic BPE example: {"low":5, "lower":2, "newest":6, "widest":3}
    val types = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTokenizer.learnFromWordCounts(types, 4)
    // pair counts: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8(newest)+2(lower)...
    // rank 1: (e,s) ties (s,t) at 9 -> lexicographic: ("e","s")
    assert(merges.head == ("e", "s"))
    // rank 2: ("es","t") now counts 9 — the chain continues through the merge
    assert(merges(1) == ("es", "t"))
    // deterministic: same input, same merges
    assert(BpeTokenizer.learnFromWordCounts(types, 4).toSeq == merges.toSeq)
  }

  test("encode applies merges greedily by rank and reconstructs exactly") {
    val model = BpeTokenizer.BpeModel(Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val df = Seq((1L, "newest low lowest"), (2L, ""), (3L, "xyz"))
      .toDF("id", "text")
      .select(col("id"), BpeTokenizer.encodeText(col("text"), model).as("sub"))
    val out = df.orderBy("id").collect().map(_.getSeq[String](1).toList)
    assert(out(0) == List("n", "e", "w", "est", "low", "low", "est"))
    assert(out(1) == Nil)
    assert(out(2) == List("x", "y", "z"))
  }

  test("reconstruction is lossless on the real corpus and merges actually fire") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val model = BpeTokenizer.learn(docs, numMerges = 100, maxWordTypes = 50000)
    // the tiny sf0.001 vocab may exhaust (no pair left with count >= 2)
    // before the budget — both are valid stops
    assert(model.merges.size >= 50 && model.merges.size <= 100,
      s"unexpected merge count ${model.merges.size}")
    val checked = docs
      .select(
        TextAnalysis.tokens(col("text")).as("w"),
        BpeTokenizer.encodeText(col("text"), model).as("s"))
      .select(
        (array_join(col("w"), "") === array_join(col("s"), "")).as("ok"),
        size(col("w")).as("nw"), size(col("s")).as("ns"),
        aggregate(col("w"), lit(0), (a, x) => a + length(x)).as("nc"))
    val row = checked.agg(
      min(col("ok")), sum("nw"), sum("ns"), sum("nc")).head()
    assert(row.getBoolean(0), "some document failed byte-exact reconstruction")
    val (nw, ns, nc) = (row.getLong(1), row.getLong(2), row.getLong(3))
    assert(ns >= nw && ns < nc,
      s"subword count $ns must sit strictly between word count $nw and char count $nc")
  }

  test("save/load roundtrips the model; loading garbage fails loudly") {
    val model = BpeTokenizer.BpeModel(Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val path = s"${tmpDir("bpe")}/model.json"
    BpeTokenizer.save(spark, model, path)
    assert(BpeTokenizer.load(spark, path) == model)
    val bad = s"${tmpDir("bpe")}/bad.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      """{"format":"something-else","merges":[]}""".getBytes)
    intercept[IllegalArgumentException](BpeTokenizer.load(spark, bad))
    intercept[java.io.FileNotFoundException](
      BpeTokenizer.load(spark, s"${tmpDir("bpe")}/absent.json"))
  }

  test("empty merge budget degrades to codepoint splitting") {
    val model = BpeTokenizer.BpeModel(Nil)
    val out = Seq((1L, "ab c")).toDF("id", "text")
      .select(BpeTokenizer.encodeText(col("text"), model))
      .head().getSeq[String](0)
    assert(out.toList == List("a", "b", "c"))
  }

  test("unicode beyond the BMP splits and merges on codepoints, not chars") {
    val types = Array(("😀😀", 5L)) // two identical emoji
    val merges = BpeTokenizer.learnFromWordCounts(types, 1)
    assert(merges == Seq(("😀", "😀")))
    val model = BpeTokenizer.BpeModel(merges)
    val out = Seq((1L, "😀😀")).toDF("id", "text")
      .select(BpeTokenizer.encodeText(col("text"), model))
      .head().getSeq[String](0)
    assert(out.toList == List("😀😀"))
  }
}
