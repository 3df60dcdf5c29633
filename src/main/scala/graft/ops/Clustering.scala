package graft.ops

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Embedding-space clustering for corpus curation (SemDeDup-style
  * cluster-then-filter, topic bucketing, per-cluster sampling): train
  * centroids on a SAMPLE with MLlib k-means, then assign the full
  * corpus at scan speed.
  *
  * The 100 TB shape mirrors [[QualityClassifier]]: [[fitKMeans]] is
  * driver-coordinated and sample-sized, run once; [[assignLiteral]]
  * carries the centroids as literal arrays inside the plan, so
  * assignment is a PURE PROJECTION — k codegen'd dot products and an
  * argmin per row, zero shuffle, zero model objects on executors.
  * [[assignJoin]] is the same math with table-resident centroids
  * (broadcast join + map-side-combined `min_by`) — the form the oracle
  * checks, since its centroids are derivable in SQL.
  *
  * Distances: squared L2 expanded as `v·v − 2·v·c + c·c` — three
  * sequential-fold dot products, the exact expression both engines
  * compute in the same operation order (see [[DotProduct]] scaladoc for
  * the bit-parity argument). Ties break to the LOWEST cluster id on
  * both paths.
  */
object Clustering {

  private def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Squared L2 in oracle-matched operation order. */
  private def sqDist(v: Column, c: Column): Column =
    dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)

  /** MLlib k-means on `vecCol` (array of float/double) — returns the
    * fitted centroids. Deterministic for a fixed seed.
    */
  def fitKMeans(
      df: DataFrame,
      vecCol: String,
      k: Int,
      maxIter: Int = 20,
      seed: Long = 42L): Array[Array[Double]] = {
    val features = df.select(
      org.apache.spark.ml.functions.array_to_vector(
        transform(col(vecCol), _.cast("double"))).as("__features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed).setFeaturesCol("__features")
      .fit(features)
    model.clusterCenters.map(_.toArray)
  }

  /** Nearest-centroid assignment with literal centroids: adds
    * (`cluster`, `d2`) as a projection — no join, no shuffle. Argmin
    * via `array_min` over (distance, cluster) structs (lexicographic:
    * smallest distance, then lowest cluster).
    */
  def assignLiteral(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cands = array(centroids.zipWithIndex.map { case (c, j) =>
      struct(sqDist(col(vecCol), lit(c)).as("d2"), lit(j.toLong).as("cluster"))
    }: _*)
    df.withColumn("__best", array_min(cands))
      .withColumn("cluster", col("__best.cluster"))
      .withColumn("d2", col("__best.d2"))
      .drop("__best")
  }

  /** Nearest-centroid assignment against a centroid TABLE
    * (`seedIdCol`, `seedVecCol`): broadcast the centroids, one
    * map-side-combined `min_by` per vector — the oracle-checkable twin
    * of [[assignLiteral]] (same distance expression, same tie rule).
    * Output: (`idCol`, `cluster`, `d2`).
    */
  def assignJoin(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame,
      seedIdCol: String,
      seedVecCol: String): DataFrame = {
    val paired = vectors.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(seeds.select(
        col(seedIdCol).cast(LongType).as("__cluster"), col(seedVecCol).as("__cvec"))))
      .withColumn("__d2", sqDist(col(vecCol), col("__cvec")))
    paired
      .groupBy(col(idCol))
      .agg(
        min_by(col("__cluster"), struct(col("__d2"), col("__cluster"))).as("cluster"),
        min(struct(col("__d2"), col("__cluster"))).getField("__d2").as("d2"))
  }
}
