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
}
