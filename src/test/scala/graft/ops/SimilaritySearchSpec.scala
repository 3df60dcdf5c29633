package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter($"vec_id" < 10)
    .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
  private def candidates = emb.select($"vec_id".as("n_id"), $"embedding".as("n_vec"))

  test("cosine of a vector with itself is 1") {
    val sims = emb.limit(5)
      .select(SimilaritySearch.cosine($"embedding", $"embedding").as("s"))
      .as[Double].collect()
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("brute-force top-k returns k ordered neighbors per query") {
    val top = SimilaritySearch.bruteForceTopK(queries, candidates, k = 5)
    val rows = top.orderBy("q_id", "rnk").collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims not descending")
    }
    // no self-matches
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("LSH ANN recall vs brute force is useful and never returns self") {
    val exact = SimilaritySearch.bruteForceTopK(queries, candidates, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.lshTopK(queries, candidates, k = 5, numPlanes = 4, numTables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.forall { case (q, n) => q != n })
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // these embeddings are near-random (top-5 sims ~0.3-0.5), the hard
    // case for hyperplane LSH; 8 tables × 4 planes must still recover a
    // solid fraction vs the ~1% random baseline
    assert(recall >= 0.30, s"LSH recall $recall too low")
  }

  test("LSH buckets are deterministic across runs") {
    val b1 = candidates.select($"n_id", SimilaritySearch.lshBucket($"n_vec", 8, 64).as("b"))
      .orderBy("n_id").as[(Long, Long)].collect()
    val b2 = candidates.select($"n_id", SimilaritySearch.lshBucket($"n_vec", 8, 64).as("b"))
      .orderBy("n_id").as[(Long, Long)].collect()
    assert(b1.sameElements(b2))
    assert(b1.map(_._2).distinct.length > 1, "all vectors in one bucket")
  }

  test("IVF ANN recall beats random and respects k") {
    val exact = SimilaritySearch.bruteForceTopK(queries, candidates, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilaritySearch.ivfTopK(queries, candidates, k = 5, nLists = 8, nProbe = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.forall { case (q, n) => q != n })
    assert(ivf.size <= 50)
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // probing 3/8 of the space at random would give ~37%; require better
    assert(recall >= 0.40, s"IVF recall $recall too low")
  }

  test("a fitted IVF index is reusable across query batches") {
    val index = SimilaritySearch.ivfFit(candidates, nLists = 8, seed = 42L)
    index.assigned.cache()
    try {
      // same index, one-shot parity: searching the fitted index equals
      // the convenience path with identical params
      val oneShot = SimilaritySearch.ivfTopK(queries, candidates, k = 5, nLists = 8, nProbe = 3)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reused = SimilaritySearch.ivfSearch(index, queries, k = 5, nProbe = 3)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reused == oneShot)
      // a SECOND batch against the same index works without refitting
      val batch2 = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val r2 = SimilaritySearch.ivfSearch(index, batch2, k = 5, nProbe = 3)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(r2.nonEmpty && r2.forall { case (q, n) => q != n && q >= 10 && q < 20 })
      // every candidate sits in exactly one of the nLists inverted lists
      assert(index.assigned.select("list_id").distinct().count() <= 8)
      assert(index.assigned.count() == candidates.count())
    } finally index.assigned.unpersist()
  }

  test("LSH near-dup pairs are a sound subset of the exact pairs") {
    val exact = SimilaritySearch.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilaritySearch.nearDupPairsLsh(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact), "LSH produced a pair the exact search did not")
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = SimilaritySearch.nearDupPairs(emb, "vec_id", "embedding", 0.4).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.4))
  }

  test("embedding corpus dedup keeps exactly one representative per planted cluster") {
    // three exact copies of vec 0, two of vec 1 (plus the originals),
    // re-idded above the corpus range — each planted cluster must
    // collapse to its minimum id (the original)
    val planted = emb.limit(2).collect()
    val copies = Seq(
      (1000L, planted(0).getSeq[Float](1)), (1001L, planted(0).getSeq[Float](1)),
      (1002L, planted(1).getSeq[Float](1))
    ).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)

    val survivors = SimilaritySearch
      .dedupCorpusEmbeddings(corpus, threshold = 0.999, lsh = false)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!survivors.exists(_ >= 1000L), "planted copies must be dropped")
    assert(survivors.contains(0L) && survivors.contains(1L), "originals survive")

    // LSH variant: survivors are a superset (missed candidates stay),
    // and never drop anything the exact path kept
    val lshSurvivors = SimilaritySearch
      .dedupCorpusEmbeddings(corpus, threshold = 0.999, lsh = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(lshSurvivors),
      "LSH dedup must only err toward keeping documents")
  }
}
