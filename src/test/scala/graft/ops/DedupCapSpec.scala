package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-hygiene caps on the dedup joins (VERDICT r3 §2): a hot shingle
  * in d docs of a block fans the Jaccard self-join to d² rows, and a
  * degenerate LSH bucket (e.g. all boilerplate docs sharing one band
  * signature) does the same to the candidate join. The caps bound both
  * without changing results on corpora where they don't bind.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  /** 40 docs, every one containing the hot trigram "the same header",
    * plus per-doc unique content; docs 2i/2i+1 additionally share a
    * unique trigram pair-wise.
    */
  private lazy val hotCorpus = (0 until 40).map { i =>
    val pairTag = s"pair${i / 2} tag${i / 2} mark${i / 2}"
    (i.toLong, s"the same header $pairTag unique$i token$i word$i end$i", "b")
  }.toDF("doc_id", "text", "block")

  test("hot-shingle df cap bounds Jaccard pair count") {
    // uncapped: the shared header trigrams connect every doc pair in the
    // block → ~40·39/2 pairs materialize
    val uncapped = DedupOps.ngramJaccardPairs(hotCorpus, "block", maxDocFreq = 1000).count()
    assert(uncapped > 700L, s"expected the hot shingle to connect all pairs, got $uncapped")

    // capped at df≤5: header shingles (df=40) are dropped; only the
    // pair-wise tags (df=2) survive → exactly the 20 intended pairs
    val capped = DedupOps.ngramJaccardPairs(hotCorpus, "block", maxDocFreq = 5)
    assert(capped.count() == 20L, "df cap failed to bound the join")
    // and the surviving pairs are the intended ones, with Jaccard over
    // the discriminative sub-vocabulary only
    val pairs = capped.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0 until 20).map(p => (2L * p, 2L * p + 1)).toSet)
  }

  test("df cap default does not change results when it never binds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = DedupOps.ngramJaccardPairs(docs, "source")
      .orderBy("doc_a", "doc_b").collect()
    val b = DedupOps.ngramJaccardPairs(docs, "source", maxDocFreq = Int.MaxValue)
      .orderBy("doc_a", "doc_b").collect()
    assert(a.sameElements(b))
  }

  test("LSH bucket cap skips degenerate all-identical buckets") {
    // 30 identical docs: every band bucket holds all 30 ids
    val degenerate = (0 until 30).map(i => (i.toLong, "same text every single time here now"))
      .toDF("doc_id", "text")
    val bands = DedupOps.lshBands(DedupOps.minHashSignatures(degenerate))
    assert(DedupOps.minHashCandidates(bands).count() == 30L * 29 / 2)
    assert(DedupOps.minHashCandidates(bands, maxBucket = 10).count() == 0L,
      "bucket cap failed to skip the degenerate bucket")
  }
}
