package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters around (1,0,…) and (0,1,…);
  // ids 10/11 near-identical in cluster A, 20/21 near-identical in B,
  // id 12 (A) and id 22 (B) deliberately similar to each OTHER but
  // assigned to different clusters — the documented SemDeDup miss
  private def vecs = Seq(
    (10L, Array(1.00, 0.01, 0.0, 0.0)),
    (11L, Array(0.99, 0.02, 0.0, 0.0)),
    (12L, Array(0.80, 0.60, 0.0, 0.0)),
    (20L, Array(0.01, 1.00, 0.0, 0.0)),
    (21L, Array(0.02, 0.99, 0.0, 0.0)),
    (22L, Array(0.60, 0.80, 0.0, 0.0)),
    (30L, Array(0.0, 0.0, 1.0, 0.0))
  ).toDF("vec_id", "embedding")

  private val centroids = Seq(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0))

  test("within-cluster dups collapse; cross-cluster near-dups survive by design") {
    val out = SimilaritySearch
      .semDedup(vecs, "vec_id", "embedding", centroids, threshold = 0.97)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // 11 collapses into 10, 21 into 20; 12 and 22 have cosine ~0.96 w/
    // threshold .97? both survive as cluster-mates of their reps only
    assert(out == Set(10L, 12L, 20L, 22L, 30L), s"got $out")
  }

  test("cross-cluster pair above threshold is still spared (the SemDeDup approximation)") {
    // 12·22 cosine = 0.96 → raise it above threshold by lowering τ to 0.9:
    // all-pairs dedup would collapse 22 into 12, SemDeDup must not
    val all = SimilaritySearch
      .dedupCorpusEmbeddings(vecs, "vec_id", "embedding", threshold = 0.9, lsh = false)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sem = SimilaritySearch
      .semDedup(vecs, "vec_id", "embedding", centroids, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!all.contains(22L), s"fixture: all-pairs should collapse 22 into 12, got $all")
    assert(sem.contains(22L) && sem.contains(12L), s"got $sem")
  }

  test("literal-centroid and table-centroid paths agree") {
    val seeds = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0, 0.0))).toDF("seed_id", "seed_vec")
    val a = SimilaritySearch
      .semDedup(vecs, "vec_id", "embedding", centroids, threshold = 0.97)
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SimilaritySearch
      .semDedupJoin(vecs, "vec_id", "embedding", seeds, "seed_id", "seed_vec", threshold = 0.97)
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("the pair search plans as an equality join on cluster, not a cartesian") {
    val assigned = Clustering.assignLiteral(vecs, "embedding", centroids)
    val a = assigned.select(col("cluster").as("__c"), col("vec_id").as("id_a"),
      col("embedding").as("vec_a"))
    val b = assigned.select(col("cluster").as("__c"), col("vec_id").as("id_b"),
      col("embedding").as("vec_b"))
    val plan = a.join(b, "__c").filter(col("id_a") < col("id_b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__c"), plan)
  }
}
