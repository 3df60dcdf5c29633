package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Lexical (BM25) retrieval over a document corpus — the inverted-index
  * operation a training-data pipeline runs for targeted corpus probes
  * (find documents about X), contamination forensics, and hard-negative
  * mining for retriever training. The reference has no read-side search
  * (SURVEY.md §3 — its only read query is the dedup anti-join); this is
  * the natural next read operator over its `documents` corpus, expressed
  * as declarative Spark the way [[DedupOps]] expresses near-dup search.
  *
  * Scale shape (the 100 TB argument):
  *   - [[postings]] is the index build: one corpus scan, one explode,
  *     ONE map-side-combinable hash aggregation keyed (doc, term) — the
  *     doc length rides the same aggregate (`max`, constant per doc), so
  *     no second corpus pass or doc-side join. At 100 TB this runs once
  *     and persists as a lakehouse table; search never rescans text.
  *   - [[bm25TopK]] searches with NO scan of the raw corpus: query terms
  *     broadcast onto the postings (the probe rides the postings'
  *     existing exchange), per-term document frequencies aggregate over
  *     only the probed postings rows (tiny — bounded by query vocab),
  *     broadcast back, and scoring is a projection + one (query, doc)
  *     hash aggregation. Top-k is a per-query window over per-query
  *     candidate rows; #queries is small by contract.
  *
  * Determinism (oracle discipline): the per-(query, term, doc) BM25
  * contribution is one fixed dag of IEEE double ops plus a single `ln`;
  * it is rounded to a 1e-4-scaled long BEFORE the per-document sum, so
  * aggregation order cannot move a bit and a last-ulp `ln` divergence
  * between engines would need the true value within ~1e-12 of a rounding
  * boundary to surface. Ranking sorts the scaled long, ties to lower
  * doc id — totally ordered, engine-portable.
  */
object Retrieval {

  /** Inverted-index postings: one row per (doc, term) with the term
    * frequency `tf` and the document's token length `dl`. Tokenization
    * is [[TextAnalysis.tokens]] (split on single space, drop empties) so
    * the DuckDB oracle tokenizes identically.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("term"))
      // explicit null filter (r19, guide §2.4): search consumers join on
      // `term` and push an inferred isnotnull(term) through this
      // aggregate while corpusStats does not — canonically different
      // subtrees, so the corpus explode+aggregate ran per consumer.
      // Stated once here (tokens are never null — vacuous), all three
      // consumers share one exchange.
      .filter(col("term").isNotNull)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Corpus stats as a 1-row frame: document count `n` and total token
    * length `sdl`, both exact longs cast to double once — so `avgdl`
    * (`sdl / n`) is a single IEEE division both engines perform
    * identically.
    */
  private def corpusStats(post: DataFrame, idCol: String): DataFrame =
    post.groupBy(col(idCol)).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(col("dl")).cast(DoubleType).as("sdl"))

  /** BM25 top-k over a prebuilt postings frame ([[postings]] schema).
    * `queries` are (query id, query text) pairs, tokenized with the same
    * rule as the corpus; duplicate terms within a query count once.
    * Returns (`q_id`, `idCol`, `rnk`, `score`) — `topK` rows per query,
    * ranked by BM25 desc, ties to the lower doc id.
    *
    * Lucene-variant BM25: idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * tf-part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    */
  def searchPostings(
      post: DataFrame,
      idCol: String,
      queries: Seq[(Long, String)],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = post.sparkSession
    import spark.implicits._

    val qterms = queries
      .flatMap { case (qid, text) =>
        text.split(" ").iterator.filter(_.nonEmpty).toSet[String].map(qid -> _)
      }
      .toDF("q_id", "term")

    // stats + df aggregate over postings only (never the raw corpus);
    // df counts rows of the probed postings because (doc, term) is unique
    val stats = corpusStats(post, idCol)
    val probed = post.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfByTerm = probed.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val hits = post
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfByTerm), Seq("term"))
      .crossJoin(broadcast(stats))

    // one fixed dag of double ops + one ln, rounded to 1e-4 longs BEFORE
    // the sum — identical parenthesization in the DuckDB oracle
    val tfD = col("tf").cast(DoubleType)
    val dfD = col("df").cast(DoubleType)
    val dlD = col("dl").cast(DoubleType)
    val idf = log(lit(1.0) + (col("n") - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfPart = tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / (col("sdl") / col("n")))))
    val scaled = round(idf * tfPart * lit(10000.0)).cast(LongType)

    val perDoc = hits
      .select(col("q_id"), col(idCol), scaled.as("s"))
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("s")).as("s"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("s").desc, col(idCol))
    perDoc
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"),
        (col("s") / 10000.0).as("score"))
  }

  /** Query-term OVERLAP retrieval over a postings frame: rank documents
    * by how many DISTINCT query terms they contain — the cheap
    * high-recall lexical list a fusion pass pairs with BM25 (overlap
    * surfaces docs whose matched terms BM25's idf weighting down-ranks).
    * Same scale shape as [[searchPostings]]: query terms broadcast onto
    * the postings, one (query, doc) aggregate, per-query window — and
    * the score is an integer count, so the ranking involves no floating
    * point at all. Returns (`q_id`, idCol, `rnk`, `overlap`); ties to
    * the lower doc id.
    */
  def overlapTopK(
      post: DataFrame,
      idCol: String,
      queries: Seq[(Long, String)],
      topK: Int): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = post.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, text) =>
        text.split(" ").iterator.filter(_.nonEmpty).toSet[String].map(qid -> _)
      }
      .toDF("q_id", "term")
    // (doc, term) is unique in postings ⇒ matched-row count IS the
    // distinct-term overlap
    val per = post.join(broadcast(qterms), Seq("term"))
      .groupBy(col("q_id"), col(idCol))
      .agg(count(lit(1)).as("overlap"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("overlap").desc, col(idCol))
    per.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"), col("overlap"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists: each
    * input frame carries (`q_id`, idCol, `rnk`) and contributes
    * 1/(k + rnk) per (query, doc); documents are re-ranked by the sum.
    * The standard way to combine retrievers with incomparable score
    * scales (BM25 + overlap here; BM25 + dense cosine in a corpus with
    * doc-aligned embeddings) — only RANKS cross the fusion boundary.
    *
    * Scale shape: inputs are already per-query top-k (tiny by
    * contract), so the fusion is a union + one small aggregate + one
    * per-query window — no corpus access at all. Determinism: each
    * contribution is rounded to a 1e-6-scaled long BEFORE the sum
    * (integer addition is order-free), the final score is that exact
    * long divided once; ties rank to the lower doc id.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      topK: Int,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val contrib = lists.map(_.select(col("q_id"), col(idCol),
      round(lit(1000000.0) / (lit(kRrf) + col("rnk"))).cast(LongType).as("c")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("c")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("s").desc, col(idCol))
    fused.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col(idCol), col("rnk"),
        (col("s") / 1000000.0).as("rrf"))
  }

  /** Convenience: build the index and search it in one call. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    searchPostings(postings(docs, idCol, textCol), idCol, queries, topK, k1, b)
}
