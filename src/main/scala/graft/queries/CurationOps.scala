package graft.queries

import graft.Tables.t
import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-curation queries over the documents table: deterministic
  * stratified sampling, mixture resampling, and token-budget shard
  * packing. All fully value-oracled — the md5 gate, the IEEE-double
  * rate arithmetic, and the integer prefix sums reproduce bit-for-bit
  * in DuckDB (see Curation scaladoc for the parity arguments).
  */
object CurationOps {

  /** Per-source keep rates for the stratified sample; everything else
    * falls back to 10%. Inlined into the oracle CASE below.
    */
  private val stratRates = Map("src0" -> 0.75, "src1" -> 0.5, "src2" -> 0.25)

  /** Target mixture proportions: sources outside the map are dropped. */
  private val mixWeights =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  private val shardBudget = 500L

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_sample_stratified",
      (s, dir) =>
        Curation
          .sampleByHash(t(s, dir, "documents"), "doc_id", "source",
            stratRates, defaultRate = 0.1)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, source FROM documents
              |WHERE ${Curation.uniformGateSql("doc_id::VARCHAR")}
              |  < CASE source WHEN 'src0' THEN 0.75 WHEN 'src1' THEN 0.5
              |                WHEN 'src2' THEN 0.25 ELSE 0.1 END
              |ORDER BY doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // largest-possible corpus at the target source mixture: K =
      // floor(min_s(n_s/w_s)), stratum rate = (w_s*K)/n_s — the oracle
      // recomputes the same counts/rates in SQL with the arithmetic in
      // the same operation order, so the per-row decisions match.
      "q_sample_mixture",
      (s, dir) =>
        Curation
          .mixtureSample(t(s, dir, "documents"), "doc_id", "source", mixWeights)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id"),
      Some(s"""WITH w(source, wt) AS (VALUES
              |  ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1)
              |), c AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS n
              |  FROM documents JOIN w USING (source) GROUP BY source
              |), k AS (
              |  SELECT floor(min(n / wt)) AS kk FROM c JOIN w USING (source)
              |), r AS (
              |  SELECT c.source, (wt * kk) / n AS rate
              |  FROM c JOIN w USING (source) CROSS JOIN k
              |)
              |SELECT d.doc_id, d.source
              |FROM documents d JOIN r ON d.source = r.source
              |WHERE ${Curation.uniformGateSql("d.doc_id::VARCHAR")} < r.rate
              |ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      // concat-and-chunk shard assignment: shard = excl-prefix-tokens
      // div budget, windowed per source — exact long arithmetic, so the
      // oracle matches bit-for-bit (DuckDB sum() is HUGEINT → cast).
      "q_pack_shards",
      (s, dir) =>
        Curation
          .packShards(t(s, dir, "documents"), Seq("source"), "doc_id",
            TextAnalysis.tokenCount(col("text")), shardBudget)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("excl_tokens"), col("shard_id"))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (
              |  SELECT doc_id, source,
              |         CAST(length(list_filter(string_split(text, ' '),
              |                                 t -> length(t) > 0)) AS BIGINT) AS n_tokens
              |  FROM documents
              |), p AS (
              |  SELECT doc_id, source, n_tokens,
              |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |           - n_tokens AS BIGINT) AS excl_tokens
              |  FROM d
              |)
              |SELECT doc_id, source, n_tokens, excl_tokens,
              |       excl_tokens // $shardBudget AS shard_id
              |FROM p ORDER BY doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // quality-ordered selection under a token budget: greedy prefix of
      // the (n_chars desc, doc_id asc) order while inclusive cumulative
      // tokens <= 15000. The engine computes the global cumsum with the
      // two-level prefix sum (no single-partition window); the oracle's
      // one global window proves the distributed form computes the same
      // prefix exactly.
      "q_text_token_budget",
      (s, dir) =>
        Curation.selectByTokenBudget(
            t(s, dir, "documents").select("doc_id", "n_chars", "text"),
            idCol = "doc_id", scoreCol = "n_chars",
            tokens = TextAnalysis.tokenCount(col("text")), budget = 15000L)
          .select(col("doc_id"), col("n_chars"), col("cum_tokens"))
          .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, n_chars,
             |         CAST(length(list_filter(string_split(text, ' '),
             |                                 t -> length(t) > 0)) AS BIGINT) AS ntok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, n_chars,
             |         CAST(sum(ntok) OVER (ORDER BY n_chars DESC, doc_id ASC
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS BIGINT) AS cum_tokens
             |  FROM d
             |)
             |SELECT doc_id, n_chars, cum_tokens FROM c
             |WHERE cum_tokens <= 15000 ORDER BY doc_id""".stripMargin)
    )
  )
}
