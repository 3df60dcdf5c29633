package graft.ops

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Product quantization for embedding search at memory scale: split each
  * vector into `m` subvectors, quantize each against its own small
  * codebook, and store only the code tuple — a 64-dim float vector
  * (256 B) compresses to `m` small ints. Search runs ADC (asymmetric
  * distance computation): the QUERY stays exact, candidate distance is
  * the sum of per-subvector distances from query-subvector to the
  * candidate's CODEBOOK entry — a table lookup per subvector, never a
  * full-vector dot product per candidate.
  *
  * The 100 TB shape, mirroring [[Clustering]]/[[QualityClassifier]]:
  *   - [[fit]]: m small k-means runs on a SAMPLE (driver-coordinated,
  *     once).
  *   - [[encode]]: pure projection — m argmins over literal codebooks,
  *     zero shuffle; the corpus rewrites once to codes.
  *   - [[searchADC]]: ONE scan of the encoded corpus for ALL queries —
  *     per-query/subvector/code distance tables are metadata-sized
  *     (q·m·k doubles), broadcast as an equality join on (subvector,
  *     code), then an exact scaled-long sum per (query, candidate) and
  *     a per-query top-k. No full-precision vector is read at search
  *     time.
  *   - [[searchRerank]]: the production contract — ADC shortlist, then
  *     exact re-rank of ONLY the shortlist rows' full vectors via a
  *     broadcast id probe (quantized distances recall poorly at top-k
  *     but well at top-k·overfetch; see the measured numbers on each
  *     method).
  *
  * Determinism: per-subvector distances use the same
  * `v·v − 2·v·c + c·c` sequential-fold expression as [[Clustering]];
  * the ADC sum accumulates 1e-4-scaled longs so partial-aggregation
  * order cannot move a bit (the oracle recomputes every value).
  */
object ProductQuantization {

  /** `books(j)(c)`: centroid `c` of subvector `j`; all subvectors are
    * `dsub` wide.
    */
  final case class Codebooks(m: Int, dsub: Int, books: Seq[Seq[Array[Double]]])

  private def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  private def sqDist(v: Column, c: Column): Column =
    dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)

  private def subvec(v: Column, j: Int, dsub: Int): Column =
    slice(v, j * dsub + 1, dsub)

  /** Train per-subvector codebooks with k-means on a sample. */
  def fit(df: DataFrame, vecCol: String, dims: Int, m: Int, k: Int): Codebooks = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val books = (0 until m).map { j =>
      val sub = df.select(subvec(col(vecCol), j, dsub).as("embedding"))
      Clustering.fitKMeans(sub, "embedding", k).toSeq
    }
    Codebooks(m, dsub, books)
  }

  /** Encode vectors to code tuples: adds `pq_codes` (array of m longs)
    * as a projection — m independent argmins over literal codebooks,
    * ties to the lowest code (same rule as [[Clustering.assignLiteral]]).
    */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    val codes = array((0 until cb.m).map { j =>
      val sub = subvec(col(vecCol), j, cb.dsub)
      array_min(array(cb.books(j).zipWithIndex.map { case (c, code) =>
        struct(sqDist(sub, lit(c)).as("d2"), lit(code.toLong).as("code"))
      }: _*)).getField("code")
    }: _*)
    df.withColumn("pq_codes", codes)
  }

  /** ADC top-k: for every query (small, broadcast), the approximate
    * squared distance to every encoded candidate, keeping `topK` per
    * query (ties on distance break to the lower candidate id). Returns
    * (`q_id`, candidate `idCol`, `rnk`, `adc_d2`).
    *
    * `encoded` must carry `pq_codes` from [[encode]] with the same
    * codebooks. One scan of `encoded`: codes explode to (id, subvector,
    * code), equality-join the broadcast per-query distance table, and
    * the scaled-long sum reassembles exact per-pair distances.
    */
  def searchADC(
      encoded: DataFrame,
      idCol: String,
      queries: Seq[(Long, Array[Double])],
      cb: Codebooks,
      topK: Int): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = encoded.sparkSession
    import spark.implicits._
    // per (query, subvector, code) distance, 1e-4-scaled — exact longs
    val dtable = queries.flatMap { case (qid, q) =>
      require(q.length == cb.m * cb.dsub, s"query $qid has wrong dimensionality")
      for (j <- 0 until cb.m; code <- cb.books(j).indices) yield {
        val sub = q.slice(j * cb.dsub, (j + 1) * cb.dsub)
        val c = cb.books(j)(code)
        // q·q − 2·q·c + c·c as three sequential double folds — the same
        // operation order as [[sqDist]]/DuckDB's list_dot_product, so the
        // oracle recomputes these driver-side values bit-identically
        var qq = 0.0; var qc = 0.0; var cc = 0.0
        var i = 0
        while (i < cb.dsub) {
          qq += sub(i) * sub(i); qc += sub(i) * c(i); cc += c(i) * c(i)
          i += 1
        }
        val d2 = qq - 2.0 * qc + cc
        (qid, j, code.toLong, math.round(d2 * 10000.0))
      }
    }.toDF("q_id", "j", "code", "d2s")

    val exploded = encoded
      .select(col(idCol), posexplode(col("pq_codes")).as(Seq("j", "code")))
    val perPair = exploded
      .join(broadcast(dtable), Seq("j", "code"))
      .groupBy(col("q_id"), col(idCol))
      .agg((sum(col("d2s")) / 10000.0).as("adc_d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc_d2"), col(idCol))
    perPair
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"), col("adc_d2"))
  }

  /** ADC shortlist + exact re-rank — the production PQ search shape.
    * Quantized distances are a SHORTLIST generator (measured
    * shortlist-recall@5 0.96 at m=8 × k=64 × overfetch=10 on the 64-dim
    * test embeddings, vs 0.45 for raw ADC top-5): [[searchADC]] keeps
    * `topK·overfetch` candidates per query from the code-only scan, then
    * ONLY those rows' full-precision vectors are read back — the
    * shortlist is metadata-sized (q·topK·overfetch ids), so the
    * read-back is a broadcast semi-probe of the corpus, never a second
    * full-precision distance pass. Output (`q_id`, `idCol`, `rnk`,
    * `d2`) with exact squared-L2 and ties to the lower candidate id.
    */
  def searchRerank(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Double])],
      cb: Codebooks,
      topK: Int,
      overfetch: Int = 10): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val shortlist = searchADC(encoded, idCol, queries, cb, topK * overfetch)
      .select(col("q_id"), col(idCol))
    val qdf = queries.toDF("q_id", "q_vec")
    val rescored = encoded.select(col(idCol), col(vecCol).as("n_vec"))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qdf), Seq("q_id"))
      .withColumn("d2", sqDist(col("n_vec"), col("q_vec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2"), col(idCol))
    rescored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"), col("d2"))
  }
}
