package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Context-window chunking: split each document into overlapping
  * token-window chunks — the step between curation and tokenization in
  * a training-data pipeline (documents rarely fit a context window;
  * training consumes fixed-size pieces with overlap so no boundary
  * tokens lose their context).
  *
  * Shape: pure per-row projection (split → window starts → slices) then
  * ONE `posexplode` — no shuffle, no UDF, all higher-order functions
  * inside whole-stage codegen. Output is O(input tokens / stride) rows;
  * at 100 TB the explode factor is bounded by window/stride and the
  * operator remains scan-speed, embarrassingly parallel.
  *
  * Chunk layout for `window = W`, `overlap = V` (stride `S = W - V`):
  * starts at 0, S, 2S, … while < n_tokens; every chunk carries up to W
  * tokens; the final chunk may be shorter (never empty); a document
  * with no tokens yields NO chunks (not one empty chunk).
  */
object Chunking {

  /** Chunk `textCol` into (`chunk_idx`, `chunk`, `n_tokens`) rows,
    * carrying `idCol` through. Whitespace tokenization, space re-join
    * (the corpus contract for the testdata tables; swap the split
    * pattern for tokenizer-aware pipelines).
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      overlap: Int): DataFrame = {
    require(window > 0, "window must be positive")
    require(overlap >= 0 && overlap < window, "need 0 <= overlap < window")
    val stride = window - overlap
    // SINGLE-REFERENCE DISCIPLINE (see TextAnalysis.repetitionColumns):
    // the tokenize expression is staged ONCE as a projection attribute
    // under the Generate node; every later reference (size, slices) is
    // a read of the materialized array, not a re-tokenization. A naive
    // inline form re-ran split+filter 2 + 2·chunks times per row.
    // (CollapseProject merges Project-over-Project but never inlines a
    // projection into a Generate's generator, so the staging survives.)
    val staged = df.select(
      col(idCol),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__graft_toks"))
    val tk = col("__graft_toks")
    val n = size(tk)
    val starts = when(n > 0, sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts, s =>
      struct(
        concat_ws(" ", slice(tk, s + 1, lit(window))).as("chunk"),
        least(lit(window), n - s).cast(LongType).as("n_tokens")))
    staged.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(
        col(idCol),
        col("chunk_idx").cast(LongType).as("chunk_idx"),
        col("c.chunk").as("chunk"),
        col("c.n_tokens").as("n_tokens"))
  }

  /** GPT-style sequence packing (concat-then-chunk): concatenate every
    * document's tokens in `idCol` order into one global stream, then cut
    * it into fixed `blockSize` blocks — the layout a pretraining run
    * actually consumes ([[chunkTokens]] windows WITHIN documents;
    * packing crosses document boundaries so no block is padded). A
    * document-separator token, when wanted, is the caller's upstream
    * `concat(text, ' <eos>')`.
    *
    * The hard part at scale is the GLOBAL token offset of each document
    * — a naive `sum() OVER (ORDER BY id)` plans a single-partition
    * window. Instead, the classic two-level prefix sum:
    *
    *   1. per-doc token counts (one scan, the tokenize HOF referenced
    *      once);
    *   2. docs bucket by id range (`nBuckets` equal-width spans —
    *      uneven under id skew, which hurts nothing but balance); the
    *      per-BUCKET totals (≤ `nBuckets` rows) prefix-sum on the
    *      driver and broadcast back;
    *   3. each doc's start = its bucket's prefix + a running sum
    *      WITHIN its bucket (a window partitioned by bucket — bounded,
    *      parallel);
    *   4. tokens explode with per-doc ordinals, global position =
    *      doc start + ordinal, and blocks reassemble with one
    *      group-by on `block_id` (the one unavoidable token shuffle —
    *      reassembly must co-locate a block's tokens).
    *
    * Output: (`block_id`, `text`, `n_tokens`), every block exactly
    * `blockSize` tokens except the last. Deterministic in the corpus
    * regardless of bucketing or partitioning: the bucket scheme only
    * changes HOW the prefix is computed, never its value.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int,
      nBuckets: Int = 64): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val staged = df.select(
      col(idCol).cast(LongType).as("__id"),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__toks"))
    val counts = staged.select(col("__id"), size(col("__toks")).cast(LongType).as("__n"))
    val mm = counts.agg(min("__id"), max("__id"), count(lit(1))).head()
    val empty = spark.emptyDataset[(Long, String, Long)]
      .toDF("block_id", "text", "n_tokens")
    if (mm.getLong(2) == 0L) return empty
    val lo = mm.getLong(0)
    val width = math.max(1L, (mm.getLong(1) - lo) / nBuckets + 1L)
    val withB = counts.withColumn("__b",
      floor((col("__id") - lit(lo)) / lit(width.toDouble)).cast(LongType))
    val totals = withB.groupBy("__b").agg(sum("__n").as("__bn"))
      .orderBy("__b").collect()
    var acc = 0L
    val prefix = totals.map { r =>
      val p = (r.getLong(0), acc)
      acc += r.getLong(1)
      p
    }.toSeq.toDF("__b", "__p")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy("__id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = withB.join(broadcast(prefix), Seq("__b"))
      .withColumn("__start", col("__p") + coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col("__id"), col("__start"))
    val exploded = staged
      .select(col("__id"), posexplode(col("__toks")).as(Seq("__ord", "__tok")))
    exploded.join(offsets, Seq("__id"))
      .withColumn("__pos", col("__start") + col("__ord"))
      .groupBy(floor(col("__pos") / lit(blockSize.toDouble)).cast(LongType).as("block_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")),
          " ").as("text"),
        count(lit(1)).as("n_tokens"))
  }

  /** CONTENT-DEFINED chunking (FastCDC/Rabin idea at token granularity):
    * a chunk boundary falls after token `p` exactly when the k-token
    * gram ENDING at `p` hashes to 0 mod `modulus` — boundaries are a
    * function of local content, not of position, so an edit moves only
    * the chunks around it while fixed-size chunking reshuffles every
    * chunk after the edit point. The chunking that keeps chunk-level
    * dedup and embedding caches stable across document revisions — the
    * property [[chunkTokens]] (position-based) cannot offer.
    *
    * Expected chunk length ≈ `modulus` tokens (geometric); `minLen` is
    * deliberately NOT implemented — a min-length rule re-introduces
    * position dependence at exactly the boundaries stability is for.
    *
    * Shape: one projection computes the gram hashes natively
    * ([[graft.functions.PolyGramHashes]] — the same codegen loop the
    * MinHash pipeline uses, so boundaries are engine-portable), one
    * `posexplode`, one per-document window prefix-sum (doc-local sort),
    * one hash aggregate that reuses the window's partitioning. No
    * corpus-wide state; scan-speed at 100 TB.
    */
  def contentDefinedChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      modulus: Int = 8): DataFrame = {
    require(k >= 1, "gram size k must be >= 1")
    require(modulus >= 2, "modulus must be >= 2")
    val toks = TextAnalysis.tokens(col(textCol))
    val exploded = df
      .select(col(idCol), toks.as("__toks"),
        graft.functions.PolyGramHashes(toks, k).as("__gs"))
      .select(col(idCol), col("__gs"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      // boundary AFTER token p ⇔ the gram ending at p (start p-k+1,
      // 1-based element index p-k+2) hashes ≡ 0 (mod modulus)
      .withColumn("__b",
        when(col("__pos") >= k - 1 &&
          element_at(col("__gs"), col("__pos") - lit(k - 2)) % modulus === 0L, 1L)
          .otherwise(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    exploded
      .withColumn("chunk_id", coalesce(sum(col("__b")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")),
          " ").as("text"),
        count(lit(1)).as("n_tokens"))
  }
}
