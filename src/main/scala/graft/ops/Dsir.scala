package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): keep the raw-corpus documents whose hashed-n-gram
  * distribution most resembles a TARGET corpus. Both distributions are
  * bag-of-hashed-ngrams models (unigrams + bigrams hashed into
  * `buckets` cells, add-one smoothed); a document's importance weight
  * is `log w(x) = Σ_f c_f(x) · (log p_f − log q_f)` where p is the
  * target model and q the raw model. The published method resamples by
  * these weights; [[select]] takes the deterministic top-k (the
  * resampling variance exists to de-bias repeated draws — for a single
  * selection pass, top-k by weight is the standard deployment and the
  * only oracle-checkable one).
  *
  * 100 TB shape (r18 rewrite): the corpus is tokenized and hashed ONCE
  * into per-(doc, bucket) counts — a map-side-combinable aggregate
  * whose shuffle and MEMORY_AND_DISK persist carry up to
  * |docs|×buckets rows (far below the occurrence stream, but
  * corpus-proportional — see the cache contract on [[scores]]). The q
  * model is those rows' per-bucket sum; the per-doc score re-reads the
  * SAME cached rows against the broadcast `buckets`-row ratio table,
  * then one hash aggregate per doc. The target model still pays its
  * own slice-sized pass. No all-pairs stage; the only sort is the
  * final top-k. Model totals are two single-row aggregates
  * (metadata-scale collects).
  *
  * Determinism for the oracle: features hash with the engine-portable
  * [[graft.functions.PolyHash]]; each bucket's log-ratio rounds to a
  * 1e-4-scaled LONG before per-doc weighting, so the per-doc sum is
  * integer arithmetic and DuckDB's replay is bit-identical (the same
  * pre-sum rounding contract as the n-gram LM perplexity oracle).
  */
object Dsir {

  /** Hashed feature buckets (unigrams + bigrams of whitespace tokens)
    * of a text column — `array<long>` with one entry per occurrence.
    */
  private[ops] def featureBuckets(text: Column, buckets: Int): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val bigrams = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bigrams),
      g => graft.functions.PolyHash(g) % buckets)
  }

  private def bucketCounts(
      df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Per-document importance scores: `(idCol, log_ratio)` over the
    * whole corpus (a document with no features scores 0.0).
    * `log_ratio` is exactly `s / 10000.0` of the integer per-bucket
    * rounded sum — deterministic across engines and partitionings.
    *
    * CACHE CONTRACT (ADVICE r18): the shared per-(doc, bucket) frame
    * stays persisted (MEMORY_AND_DISK, corpus-proportional —
    * ≤ |docs|×`buckets` rows of three longs) because the returned
    * frame's scoring join reads it; the CALLER must reclaim it after
    * materializing the result — a session cache sweep
    * (`spark.catalog.clearCache()` + unpersisting persistent RDDs, as
    * Bench/Verify do between queries) or an explicit unpersist. A
    * sweep BEFORE the result materializes is safe but silently re-pays
    * the full tokenize+hash pass; repeated calls without any sweep
    * accumulate cached frames.
    */
  def scores(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 4096): DataFrame = {
    // ONE corpus feature pass (optimization r18, guide §2.3/§2.4): the
    // raw model AND the scoring both need the corpus's hashed features,
    // and computing them twice made tokenization+hashing the operator's
    // dominant cost. The per-(doc, bucket) counts are the shared
    // currency — map-side-combinable, bounded by |docs|×buckets rows
    // (far smaller than the occurrence stream), persisted once: the q
    // model is their per-bucket sum, and the per-doc score is
    // Σ delta·cnt over the SAME cached rows (bit-identical to summing
    // delta per occurrence — integer arithmetic either way). The
    // target model still pays its own (slice-sized) pass; the ratio
    // table is collected (bucket-bounded = metadata-scale) and
    // broadcast back, as before.
    val p = bucketCounts(target, textCol, buckets).withColumnRenamed("c", "cp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDoc = corpus
      .select(col(idCol), explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = perDoc.groupBy("bucket").agg(sum("cnt").as("cq"))
    val ratioLocal = try {
      // model totals ride the ratio job as broadcast one-row aggregates
      // (r19): previously np and nq were two separate head() jobs ahead
      // of the collect — three sequential driver jobs for one
      // metadata-scale table. The sums are exact longs cast to double
      // exactly as before (addition of exact integers < 2^53 is the
      // same IEEE double either way), so every delta stays
      // bit-identical to the two-job formulation and to the oracle.
      val totals = q.agg(coalesce(sum("cq"), lit(0L)).as("__nq"))
        .crossJoin(p.agg(coalesce(sum("cp"), lit(0L)).as("__np")))
      // every scorable feature is a CORPUS feature by construction, so
      // q is the spine; target-only buckets can never be referenced.
      // The delta is computed by SPARK's round (collected afterwards),
      // so its HALF_UP semantics stay bit-identical to the oracle's.
      val ratios = q.join(p, Seq("bucket"), "left")
        .na.fill(0L, Seq("cp"))
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          round((log((col("cp") + 1.0) /
              (col("__np").cast("double") + lit(buckets.toDouble))) -
            log((col("cq") + 1.0) /
              (col("__nq").cast("double") + lit(buckets.toDouble)))) * 10000.0)
            .cast(LongType).as("delta"))
      corpus.sparkSession.createDataFrame(
        java.util.Arrays.asList(ratios.collect(): _*), ratios.schema)
    } finally {
      p.unpersist(blocking = false)
      // perDoc stays persisted: the returned frame's scoring join reads
      // it (the whole point of the single pass); the caller's session
      // sweep reclaims it, same contract as the curation diamonds
    }
    val summed = perDoc
      .join(broadcast(ratioLocal), "bucket")
      .groupBy(idCol).agg(sum(col("delta") * col("cnt")).as("s"))
    corpus.select(col(idCol))
      .join(summed, Seq(idCol), "left")
      .na.fill(0L, Seq("s"))
      .select(col(idCol), (col("s").cast("double") / 10000.0).as("log_ratio"))
  }

  /** Deterministic DSIR selection: the `k` highest-importance documents
    * (ties broken by id). Returns `(idCol, log_ratio, rank)`. The cut
    * is `orderBy(...).limit(k)` — Spark plans TakeOrdered (per-partition
    * top-k + driver merge), never a global sort shuffle; the rank
    * window then runs over k rows only. Same cache contract as
    * [[scores]]: the caller sweeps/unpersists after materializing.
    */
  def select(
      corpus: DataFrame,
      target: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scores(corpus, target, idCol, textCol, buckets)
      .orderBy(col("log_ratio").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("log_ratio").desc, col(idCol).asc)))
  }
}
