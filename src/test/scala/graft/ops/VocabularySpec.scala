package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabularySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, ""),
    (4L, "cat cat rare")
  ).toDF("doc_id", "text")

  test("ids rank by frequency then lexicographically; minFreq and maxSize bind") {
    val v = Vocabulary.build(docs, "text", maxSize = 100).orderBy("token_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // the:3, cat:3 tie -> 'cat' < 'the'; then sat:2; then singletons asc
    assert(v.take(3) == List(("cat", 0L, 3L), ("the", 1L, 3L), ("sat", 2L, 2L)))
    assert(v.map(_._1).drop(3) == List("dog", "mat", "on", "rare"))
    val capped = Vocabulary.build(docs, "text", maxSize = 2)
    assert(capped.count() == 2)
    val freq2 = Vocabulary.build(docs, "text", maxSize = 100, minFreq = 2L)
    assert(freq2.select("token").collect().map(_.getString(0)).toSet ==
      Set("cat", "the", "sat"))
  }

  test("encode preserves order, maps OOV to the sentinel, keeps empty docs") {
    val vocab = Vocabulary.build(docs, "text", maxSize = 3) // cat=0 the=1 sat=2
    val got = Vocabulary.encode(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[collection.Seq[Long]](1).toList, r.getLong(2)))
      .toList
    assert(got == List(
      (1L, List(1L, 0L, 2L, -1L, 1L, -1L), 6L),
      (2L, List(1L, -1L, 2L), 3L),
      (3L, List(), 0L),
      (4L, List(0L, 0L, -1L), 3L)))
  }

  test("round-trip: encode with a full vocab then decode recovers the corpus") {
    val corpus = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val vocab = Vocabulary.build(corpus, "text", maxSize = 1000000)
    val enc = Vocabulary.encode(corpus, "doc_id", "text", vocab)
    assert(enc.filter(array_contains(col("token_ids"), -1L)).count() == 0)
    val decoded = enc
      .select(col("doc_id"), posexplode(col("token_ids")).as(Seq("ord", "token_id")))
      .join(vocab, Seq("token_id"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ord"), col("token")))),
        s => s.getField("token")), " ").as("text2"))
    val orig = corpus.select(col("doc_id"),
      array_join(filter(split(col("text"), "\\s+"), t => length(t) > 0), " ").as("text1"))
    assert(orig.join(decoded, Seq("doc_id"))
      .filter(col("text1") =!= col("text2")).count() == 0)
  }
}
