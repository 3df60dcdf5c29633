package graft.ops

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  private def emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  private def queries20 = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def corpus = emb
    .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))

  test("persistent search is byte-equal to in-memory ivfSearch over the same state") {
    val idx = VectorIndex.build(
      spark, new Path(tmpDir("vecidx-parity"), "ivf"), corpus, nLists = 8)
    val mem = SimilaritySearch.IvfIndex(
      idx.vectors.read(), idx.centroids.read(), nLists = 8)

    val pers = VectorIndex.search(idx, queries20, k = 5, nProbe = 4)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inMem = SimilaritySearch.ivfSearch(mem, queries20, k = 5, nProbe = 4)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pers == inMem,
      s"persistence must not change the answer (only ${pers.intersect(inMem).size} " +
        s"of ${inMem.size} ranked hits agree)")
    assert(pers.nonEmpty)
  }

  test("a probe plans only the probed lists' files, not the corpus") {
    val idx = VectorIndex.build(
      spark, new Path(tmpDir("vecidx-prune"), "ivf"), corpus, nLists = 8)
    val total = idx.vectors.currentDataFiles.size
    assert(total >= 8, s"identity(list_id) layout should split files per list (got $total)")

    val twoLists = idx.vectors.read()
      .select("list_id").distinct().orderBy("list_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val probe = idx.vectors.readPartitionIn("list_id", twoLists)
    val planned = probe.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum
    assert(planned < total,
      s"probing 2 of 8 lists must prune the scan (planned=$planned of $total files)")
    assert(probe.select("list_id").distinct().collect().map(_.getLong(0)).toSet ==
      twoLists.toSet)
  }

  test("append assigns against the frozen quantizer and lands in the probed lists") {
    val dir = new Path(tmpDir("vecidx-append"), "ivf")
    val base = corpus.filter(col("n_id") >= 50)
    val idx = VectorIndex.build(spark, dir, base, nLists = 4)
    val before = idx.vectors.read().count()

    val batch = corpus.filter(col("n_id") < 50)
    VectorIndex.append(idx, batch)
    assert(idx.vectors.read().count() == before + batch.count())

    // assignment parity: the appended rows must sit exactly where a
    // literal-centroid projection against the frozen quantizer puts them
    val cents = idx.centroids.read().orderBy("list_id").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray).toSeq
    val expect = Clustering.assignLiteral(batch, "n_vec", cents)
      .select(col("n_id"), col("cluster").cast("long").as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = idx.vectors.read().filter(col("n_id") < 50)
      .select("n_id", "list_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "append must reuse the frozen centroids, not refit")

    // searching the reopened index still answers (exercise open())
    val reopened = VectorIndex.open(spark, dir)
    val res = VectorIndex.search(reopened, queries20, k = 3, nProbe = 2)
    assert(res.groupBy("q_id").count().filter(col("count") =!= 3).count() == 0)
  }
}
