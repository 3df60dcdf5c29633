package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Frequency-ranked vocabulary build and token→id encoding — the bridge
  * between text curation and what a training run actually reads
  * (integer id sequences; compose with [[Chunking.packSequences]] /
  * [[Chunking.chunkTokens]] for the final layout).
  *
  * Scale shape:
  *   - [[build]] is one corpus scan (explode → map-side-combined count)
  *     whose output is |V| rows — VOCABULARY-sized, not corpus-sized.
  *     The global frequency rank is a window over those |V| rows
  *     (bounded by `maxSize`·spill margin, nothing like corpus scale),
  *     with the deterministic total order (freq DESC, token ASC) both
  *     engines agree on.
  *   - [[encode]] explodes tokens with ordinals, joins the vocab (AQE
  *     broadcasts it — a vocabulary is metadata next to a corpus), and
  *     reassembles per-doc id arrays with one group-by — the same
  *     one-token-shuffle shape as line dedup and sequence packing.
  *
  * Out-of-vocabulary tokens encode as `oovId` (-1 default) rather than
  * dropping: training-side subword fallback / filtering is a POLICY,
  * and silently shortening documents would corrupt offsets computed
  * upstream.
  */
object Vocabulary {

  /** Build (`token`, `token_id`, `freq`): ids 0‥V−1 assigned by
    * (freq DESC, token ASC); tokens below `minFreq` dropped; at most
    * `maxSize` entries kept.
    */
  def build(
      df: DataFrame,
      textCol: String,
      maxSize: Int,
      minFreq: Long = 1L): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    val counts = df
      .select(explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    counts
      .withColumn("token_id", (row_number().over(w) - 1).cast(LongType))
      .filter(col("token_id") < maxSize)
      .select(col("token"), col("token_id"), col("freq"))
  }

  /** Encode each document's tokens as an id array: (`idCol`,
    * `token_ids`, `n_tokens`). Order-preserving; OOV → `oovId`;
    * a document with no tokens yields an empty array, not a dropped
    * row (offset-stability for downstream packing).
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      oovId: Long = -1L): DataFrame = {
    val staged = df.select(
      col(idCol),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__toks"))
    val exploded = staged
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__ord", "token")))
    val encoded = exploded
      .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .select(col(idCol), col("__ord"),
        coalesce(col("token_id"), lit(oovId)).as("__tid"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__ord"), col("__tid")))),
        s => s.getField("__tid")).as("token_ids"))
    // left join back so zero-token documents keep a row (empty array)
    staged.select(col(idCol))
      .join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<bigint>")).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast(LongType))
  }
}
