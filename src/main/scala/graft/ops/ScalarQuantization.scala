package graft.ops

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar (per-dimension int8) quantization for embedding search — the
  * faiss `SQ8` analog and [[ProductQuantization]]'s simpler sibling:
  * every dimension is affinely mapped to a 0‥255 code, shrinking a
  * float32 corpus 4× (float64 8×) while keeping search a pure
  * integer-arithmetic scan.
  *
  * At 100 TB the win is the same as PQ's: the code-only corpus is what
  * the ANN scan reads (4–8× less I/O, hotter caches), and because both
  * the codes AND the code-space distances are exact integers, every
  * stage — fit, encode, search — is bit-deterministic and value-checked
  * in DuckDB (no float-summation-order caveats at all; contrast the
  * scaled-long rounding PQ's ADC tables need).
  *
  *   - [[fit]]: per-dimension min/max — ONE tiny aggregate (dims ×
  *     partitions partials), collected as metadata (dims doubles).
  *   - [[encode]]: `clamp(floor((x − mn_d) · inv_d + 0.5))` as a pure
  *     projection (one interpreted-HOF `transform`, referenced once —
  *     see the HOF single-reference rule in TextAnalysis) — zero
  *     shuffle, codes written next to (or instead of) the vector.
  *   - [[search]]: code-space squared-L2 `Σ (ca−cb)²` per (query,
  *     candidate) — integer math over a broadcast of the encoded
  *     queries, `topK` per query by (distance, id).
  *   - [[searchRerank]]: the production shape — overfetched code-space
  *     shortlist, then exact float re-rank of only the shortlisted
  *     rows (same contract as [[ProductQuantization.searchRerank]]).
  *
  * Per-dimension scales mean code-space L2 is the true L2 of the
  * per-dimension NORMALIZED space — a deliberate SQ trade (dimensions
  * with wider ranges are not privileged); the re-rank pass restores
  * exact geometry on the shortlist.
  */
object ScalarQuantization {

  /** Per-dimension affine map: `code = floor((x − mins(d)) · invs(d) + 0.5)`
    * clamped to 0‥255; `invs(d) = 255 / (max_d − min_d)` (0 for constant
    * dimensions, mapping them to code 0).
    */
  case class SqParams(mins: Array[Double], invs: Array[Double]) {
    def dims: Int = mins.length
  }

  private def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  private def sqDist(v: Column, c: Column): Column =
    dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)

  /** Per-dimension min/max over the corpus. The explode is (rows × dims)
    * but reduces map-side to (partitions × dims) partials — at any scale
    * the shuffle is metadata-sized. Deterministic: min/max are exact.
    */
  def fit(df: DataFrame, vecCol: String): SqParams = {
    val stats = df
      .select(posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("d")
      .collect()
    val mins = stats.map(_.getDouble(1))
    val invs = stats.map { r =>
      val (mn, mx) = (r.getDouble(1), r.getDouble(2))
      if (mx > mn) 255.0 / (mx - mn) else 0.0
    }
    SqParams(mins, invs)
  }

  /** Quantize one value in oracle-matched IEEE operation order — shared
    * by the executor-side [[encode]] expression and the driver-side
    * query encoding so the two can never drift.
    */
  private[ops] def quantize(x: Double, mn: Double, inv: Double): Long =
    math.max(0L, math.min(255L, math.floor((x - mn) * inv + 0.5).toLong))

  /** Adds `sq_codes` (array of dims longs in 0‥255) as a PURE
    * PROJECTION — params ride as literal arrays, no join, no shuffle.
    */
  def encode(df: DataFrame, vecCol: String, p: SqParams): DataFrame = {
    val minsLit = lit(p.mins)
    val invsLit = lit(p.invs)
    df.withColumn("sq_codes",
      transform(col(vecCol), (x, d) => greatest(lit(0L), least(lit(255L),
        floor((x.cast("double") - element_at(minsLit, d + 1))
          * element_at(invsLit, d + 1) + lit(0.5))))))
  }

  /** Code-space top-k: integer squared-L2 between every encoded
    * candidate and each (broadcast, driver-encoded) query; `topK` per
    * query, ties to the lower candidate id. Output (`q_id`, `idCol`,
    * `rnk`, `code_d2`) — `code_d2` an exact BIGINT.
    */
  def search(
      encoded: DataFrame,
      idCol: String,
      queries: Seq[(Long, Array[Double])],
      p: SqParams,
      topK: Int): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = encoded.sparkSession
    import spark.implicits._
    val qcodes = queries.map { case (qid, q) =>
      require(q.length == p.dims, s"query $qid has wrong dimensionality")
      (qid, q.indices.map(d => quantize(q(d), p.mins(d), p.invs(d))).toArray)
    }.toDF("q_id", "q_codes")
    val scored = encoded.select(col(idCol), col("sq_codes"))
      .crossJoin(broadcast(qcodes))
      .select(col("q_id"), col(idCol),
        aggregate(
          zip_with(col("sq_codes"), col("q_codes"), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("code_d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("code_d2"), col(idCol))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"), col("code_d2"))
  }

  /** Code-space shortlist + exact re-rank — the production search shape:
    * only `topK · overfetch` shortlisted rows per query are read at full
    * precision (a broadcast semi-probe), never a second full scan.
    * Output (`q_id`, `idCol`, `rnk`, `d2`) with exact squared-L2.
    */
  def searchRerank(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Double])],
      p: SqParams,
      topK: Int,
      overfetch: Int = 10): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val shortlist = search(encoded, idCol, queries, p, topK * overfetch)
      .select(col("q_id"), col(idCol))
    val qdf = queries.toDF("q_id", "q_vec")
    val rescored = encoded.select(col(idCol),
        transform(col(vecCol), _.cast("double")).as("n_vec"))
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
