package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  test("fitted centroids materially reduce clustering cost and match MLlib's own assignment") {
    // (the testdata labels overlap heavily — within-label spread ~1.0 vs
    // between-label centroid distance ~0.2 — so label purity is not a
    // meaningful target; cost reduction and MLlib parity are)
    val centroids = Clustering.fitKMeans(emb, "embedding", k = 10)
    val assigned = Clustering.assignLiteral(emb, "embedding", centroids)

    // k=10 must beat k=1 (the global mean) by a material margin
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val globalMean = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(avg("x").as("m")).orderBy("i")
      .collect().map(_.getDouble(1))
    assert(globalMean.length == dims)
    val k1 = Clustering.assignLiteral(emb, "embedding", Seq(globalMean))
    val costK = assigned.agg(avg("d2")).head().getDouble(0)
    val cost1 = k1.agg(avg("d2")).head().getDouble(0)
    assert(costK < 0.95 * cost1, f"k=10 cost $costK%.4f vs k=1 $cost1%.4f — no structure learned")

    // scan-speed assignment must agree with MLlib's own transform
    val features = emb.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        transform(col("embedding"), _.cast("double"))).as("__features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(10).setMaxIter(20).setSeed(42L).setFeaturesCol("__features")
      .fit(features)
    val mllib = model.transform(features).select(col("vec_id"), col("prediction"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val ours = assigned.select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = ours.count { case (id, c) => mllib(id) == c }
    assert(agree == ours.size, s"assignment drift vs MLlib: ${ours.size - agree} of ${ours.size}")
  }

  test("literal-centroid and join assignment agree exactly") {
    val seeds = emb.filter(col("vec_id") < 8)
    val centroids = seeds.orderBy("vec_id").collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toSeq
    val viaLiteral = Clustering.assignLiteral(emb, "embedding", centroids)
      .select(col("vec_id"), col("cluster"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaJoin = Clustering.assignJoin(
        emb, "vec_id", "embedding", seeds, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaLiteral == viaJoin)
  }

  test("ties break to the lowest cluster id") {
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val sameCentroid = Array(0.0, 0.0)
    val out = Clustering.assignLiteral(df, "embedding",
      Seq(sameCentroid, sameCentroid, sameCentroid))
      .select("cluster").head().getLong(0)
    assert(out == 0L)
  }

  test("literal assignment is projection-only (no shuffle in the plan)") {
    val centroids = Seq(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val plan = Clustering.assignLiteral(emb, "embedding", centroids)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(resolved.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"expected a shuffle-free projection, got:\n$resolved")
  }
}
