package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakehouseTable

/** PERSISTENT IVF ANN index: the [[SimilaritySearch.ivfFit]] /
  * `ivfSearch` split materialized as TWO lakehouse tables — the
  * inverted lists as a table IDENTITY-PARTITIONED on `list_id`, the
  * coarse centroids as a metadata-sized side table. What the in-memory
  * form cannot give a 100 TB corpus:
  *
  *   - **probe-time I/O pruning**: a search plans ONLY the probed
  *     lists' files ([[LakehouseTable.readPartitionIn]] — manifest
  *     partition-value summaries, then dir segments, before a footer
  *     opens). nProbe/nLists of the corpus is touched per query batch,
  *     which is the entire point of IVF — here it prunes disk reads,
  *     not just join width;
  *   - **incremental growth without refit**: new embeddings are
  *     assigned to the frozen centroids at scan speed
  *     ([[Clustering.assignLiteral]] — a projection, no shuffle) and
  *     appended; the quantizer retrains only when YOU decide drift
  *     warrants it (rebuild), matching how production IVF deployments
  *     run;
  *   - **snapshot semantics for free**: index builds/appends are
  *     atomic commits — readers never see a half-written list, time
  *     travel and tags apply to the index like any table.
  *
  * Search is byte-equal to [[SimilaritySearch.ivfSearch]] over the same
  * assignment state (`q_vec_ann_persistent` pins this): same cosine
  * probe ranking, same scoring fold, same tie rule — persistence and
  * pruning change WHERE bytes come from, never the answer.
  */
object VectorIndex {

  final case class PersistentIvf(
      vectors: LakehouseTable,
      centroids: LakehouseTable)

  private val vectorsSchema = StructType(Seq(
    StructField("n_id", LongType),
    StructField("n_vec", ArrayType(FloatType)),
    StructField("list_id", LongType)))

  private val centroidsSchema = StructType(Seq(
    StructField("list_id", LongType),
    StructField("centroid", ArrayType(DoubleType))))

  // append validates against the frozen schema EXACTLY (element
  // nullability included); locally-derived frames (toDF on Array[_])
  // carry containsNull=false, so cast every column to the declared type
  private def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)

  /** Fit the coarse quantizer on `candidates` and materialize both
    * tables under `dir` (`dir/vectors` partitioned `identity(list_id)`,
    * `dir/centroids`). One KMeans job + one assignment pass.
    */
  def build(
      spark: SparkSession,
      dir: Path,
      candidates: DataFrame, // (n_id, n_vec)
      nLists: Int = 16,
      seed: Long = 42L): PersistentIvf = {
    val fit = SimilaritySearch.ivfFit(candidates, nLists, seed)
    val idx = create(spark, dir)
    idx.vectors.append(conform(fit.assigned, vectorsSchema))
    idx.centroids.append(conform(fit.centroids, centroidsSchema))
    idx
  }

  /** [[build]] variant over a LAKEHOUSE source table, wired for
    * [[sync]]: the quantizer fits on the source's current snapshot, but
    * the initial list load ships through the first sync step — so the
    * source snapshot id is recorded as the consumer watermark in the
    * same commit, and later [[sync]] calls deliver exactly the source
    * commits since (never a duplicate of the seed image). Use this when
    * the corpus keeps growing; [[build]] when indexing a static frame.
    */
  def buildFrom(
      src: LakehouseTable,
      dir: Path,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      seed: Long = 42L): PersistentIvf = {
    require(src.metadata.currentSnapshot.nonEmpty,
      s"source table ${src.tableDir} is empty — nothing to fit the quantizer on")
    val idx = create(src.spark, dir)
    // idempotence / crash-safety (ADVICE r7): create() is
    // createIfNotExists, so a re-run (e.g. after a crash between the
    // centroid commit and the first sync) must NOT fit and append a
    // second centroid set — duplicate list_ids would desynchronize
    // sync's positional assignLiteral indexing from the stored ids and
    // silently mis-assign every synced row. An existing centroid set is
    // reused as the frozen quantizer; only the sync step runs again.
    if (idx.centroids.metadata.currentSnapshot.isEmpty) {
      val cand = src.read().select(
        col(idCol).cast(LongType).as("n_id"),
        col(vecCol).cast(ArrayType(FloatType)).as("n_vec"))
      val fit = SimilaritySearch.ivfFit(cand, nLists, seed)
      idx.centroids.append(conform(fit.centroids, centroidsSchema))
    }
    // fit.assigned is deliberately discarded: the seed rows flow through
    // sync's assignLiteral path (parity with model.transform is pinned
    // by ClusteringSpec), buying the atomic watermark-with-data commit
    sync(src, idx, idCol, vecCol)
    idx
  }

  /** Create-or-open the two index tables under `dir`. */
  def create(spark: SparkSession, dir: Path): PersistentIvf =
    PersistentIvf(
      LakehouseTable.createIfNotExists(
        spark, new Path(dir, "vectors"), vectorsSchema,
        Seq("list_id" -> "identity")),
      LakehouseTable.createIfNotExists(
        spark, new Path(dir, "centroids"), centroidsSchema, Nil))

  /** Open an existing index. */
  def open(spark: SparkSession, dir: Path): PersistentIvf =
    PersistentIvf(
      LakehouseTable.load(spark, new Path(dir, "vectors")),
      LakehouseTable.load(spark, new Path(dir, "centroids")))

  /** Append new vectors WITHOUT refitting: nearest-centroid assignment
    * against the frozen quantizer as a literal-centroid projection
    * (scan speed, no shuffle — the centroid collect is nLists rows,
    * metadata-sized by construction), then one atomic append into the
    * partitioned list layout.
    */
  def append(idx: PersistentIvf, batch: DataFrame): Unit = {
    val cents = idx.centroids.read().orderBy("list_id").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    require(cents.nonEmpty, "index has no centroids — build() it first")
    val assigned = Clustering.assignLiteral(batch, "n_vec", cents.toSeq)
      .withColumn("list_id", col("cluster"))
    idx.vectors.append(conform(assigned, vectorsSchema))
    ()
  }

  /** Remove vectors by id as a merge-on-read equality delete: one
    * metadata-sized delete file, NO inverted-list rewrite — removed ids
    * disappear from every subsequent [[search]] (the probed-list read
    * rides [[LakehouseTable.readWithDeletes]]) and fold out physically
    * at the next compaction. `ids` is a 1-column frame of n_id values.
    */
  def remove(idx: PersistentIvf, ids: DataFrame): Unit = {
    idx.vectors.morDeleteKeys(
      ids.select(col(ids.columns.head).cast(LongType).as("n_id")), "n_id")
    ()
  }

  /** Keep the index fresh against a GROWING source table, exactly once:
    * one [[graft.stream.LakehouseMirror.step]] whose transform is the
    * frozen-quantizer assignment. The source snapshot id rides the
    * index table's own commit as the consumer watermark, so a crash
    * between "assign" and "record offset" is unrepresentable — the
    * delta is either committed (watermark moved) or re-derived next
    * call. Rows indexed exactly once, no refit, no full rescan: the
    * delta plan reads only the source commits since the last sync.
    *
    * `src` must carry `(idCol: long-castable, vecCol: array<float>)`.
    */
  def sync(
      src: LakehouseTable,
      idx: PersistentIvf,
      idCol: String,
      vecCol: String): Option[graft.lake.Snapshot] = {
    // the consumer id is DERIVED, not a parameter (ADVICE r7): a
    // buildFrom/sync pair called with different ids would miss the
    // watermark and re-ship the full seed image as duplicates. The
    // watermark lives in the index's own metadata, so a constant is
    // already unique per index.
    val consumerId = "vector-index"
    val cents = idx.centroids.read().orderBy("list_id").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    require(cents.nonEmpty, "index has no centroids — build() it first")
    graft.stream.LakehouseMirror.step(src, idx.vectors, consumerId, delta => {
      val batch = delta.select(
        col(idCol).cast(LongType).as("n_id"),
        col(vecCol).cast(ArrayType(FloatType)).as("n_vec"))
      conform(
        Clustering.assignLiteral(batch, "n_vec", cents.toSeq)
          .withColumn("list_id", col("cluster")),
        vectorsSchema)
    })
  }

  /** Probe-and-score, reading only the probed lists' files. Identical
    * ranking algebra to [[SimilaritySearch.ivfSearch]]; the probed-list
    * collect is ≤ nLists values (metadata-sized).
    */
  def search(
      idx: PersistentIvf,
      queries: DataFrame, // (q_id, q_vec)
      k: Int,
      nProbe: Int = 4): DataFrame = {
    import SimilaritySearch.{dot, norm}
    val wProbe = Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("list_id").asc)
    val probes = queries
      .crossJoin(broadcast(idx.centroids.read()))
      .select(col("q_id"), col("q_vec"), col("list_id"),
        (dot(col("q_vec"), col("centroid")) /
          (norm(col("q_vec")) * norm(col("centroid")))).as("c_sim"))
      .withColumn("p_rnk", row_number().over(wProbe))
      .filter(col("p_rnk") <= nProbe)
      .select("q_id", "q_vec", "list_id")

    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cand = idx.vectors.readPartitionIn("list_id", probedLists)

    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    cand
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) /
          (norm(col("q_vec")) * norm(col("n_vec")))).as("sim"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }
}
