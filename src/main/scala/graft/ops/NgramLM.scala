package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** N-gram language-model quality scoring — the CCNet-style perplexity
  * filter: fit a bigram LM on a trusted reference slice of the corpus,
  * then score every document by its average negative log-probability
  * under that model. Low score = looks like the reference (keep);
  * high score = off-distribution (noise, wrong language, boilerplate).
  * Complements [[TextAnalysis.gopherFilter]] (rule-based) and
  * [[QualityClassifier]] (supervised): this one needs no labels, only
  * a slice you trust.
  *
  * Model: add-one-smoothed conditional P(w2|w1) = (c(w1,w2) + 1) /
  * (c(w1) + V), where c(w1) is the bigram-start count (the sum of
  * c(w1, ·), so probabilities condition on what the model actually saw)
  * and V is the reference's distinct-token vocabulary size. An unseen
  * bigram with a known w1 backs off to 1/(c(w1)+V); a fully unknown w1
  * scores 1/V. Everything stays a ratio of exact integer counts, so the
  * only transcendental is one `ln` per bigram.
  *
  * 100 TB shape: the fit is two map-side-combinable hash aggregates
  * over the REFERENCE slice only (the model is vocabulary-bounded —
  * corpus-size-independent once the vocab saturates); scoring explodes
  * each document into bigrams (projection, same fan-out class as
  * [[DedupOps.shingles]]) and equality-joins the model — AQE broadcasts
  * the model while it fits, degrading to a shuffled hash join beyond
  * that, never anything pairwise. The per-doc reduce is one hash
  * aggregate.
  *
  * Determinism (oracle discipline): each bigram's ln(num/den) — num and
  * den exact longs cast to double, one IEEE division, one ln — is
  * rounded to a 1e-4-scaled long BEFORE the per-doc sum; the final
  * average is a fixed division chain. Both engines reproduce every
  * value bit-for-bit (`q_text_lm_perplexity`).
  */
object NgramLM {

  /** Fitted model: `bigrams` (w1, w2, c), `starts` (w1, c — the sum of
    * this w1's bigram counts), and 1-row `vocab` (v — distinct reference
    * tokens). All plain DataFrames; nothing is collected.
    */
  final case class BigramModel(bigrams: DataFrame, starts: DataFrame, vocab: DataFrame)

  private def docBigrams(docs: DataFrame, idCols: Seq[String], textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(idCols.map(col) :+ toks.as("__toks"): _*)
      .select(idCols.map(col) :+ explode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(0), size(col("__toks")) - 2),
            i => struct(
              element_at(col("__toks"), i + 1).as("w1"),
              element_at(col("__toks"), i + 2).as("w2"))))
          .otherwise(array())).as("__bi"): _*)
      .select(idCols.map(col) :+ col("__bi.w1") :+ col("__bi.w2"): _*)
  }

  /** Fit on the reference slice (pass a pre-filtered frame, e.g.
    * `docs.filter(col("lang") === "en")`).
    */
  def fitBigrams(ref: DataFrame, textCol: String = "text"): BigramModel = {
    // explicit null filters (r19, guide §2.4): scoring joins `bigrams`
    // on (w1, w2) and `starts` on w1, inferring DIFFERENT isnotnull
    // sets into the two derivations of this aggregate — canonically
    // different subtrees, so the reference-slice explode ran twice.
    // Stated once here, both consumers share one exchange
    // (ReusedExchange). w1/w2 come from a non-null token array and are
    // never null; even a hypothetical null row could never match the
    // equality joins that are this model's only read path.
    val bi = docBigrams(ref, Seq.empty, textCol)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val starts = bi.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val vocab = ref
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    BigramModel(bi, starts, vocab)
  }

  /** Score documents: returns (`idCol`, `n_bigrams`, `avg_nll`) — the
    * average negative ln-probability per bigram (natural-log units).
    * Documents with fewer than two tokens have no bigrams and are not
    * scoreable; they are absent from the result.
    */
  def scorePerplexity(
      docs: DataFrame,
      model: BigramModel,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bi = docBigrams(docs, Seq(idCol), textCol)
    val joined = bi
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.starts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
    val num = (coalesce(col("c"), lit(0L)) + lit(1L)).cast(DoubleType)
    val den = (coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)
    val scaled = round(log(num / den) * lit(10000.0)).cast(LongType)
    joined
      .select(col(idCol), scaled.as("s"))
      .groupBy(col(idCol))
      .agg(sum(col("s")).as("s"), count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        (-(col("s").cast(DoubleType) / col("n_bigrams").cast(DoubleType) / lit(10000.0)))
          .as("avg_nll"))
  }
}
