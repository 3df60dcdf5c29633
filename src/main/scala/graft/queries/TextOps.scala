package graft.queries

import graft.Tables.t
import graft.ops.{DedupOps, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-pipeline operators over the documents table, oracle-checked
  * where the semantics are hash-function-agnostic (token stats, quality
  * ratios, language ID, MD5 fingerprints, n-gram Jaccard). MinHash and
  * SimHash rely on Spark's murmur3/xxhash64 which DuckDB cannot
  * reproduce → registered without oracle (rows-only check) and verified
  * structurally in ScalaTest instead.
  */
object TextOps {

  /** The full (deduped, sorted) stopword list, inlined into the oracle
    * SQL so both engines classify with the same lists.
    */
  private val allStop = TextAnalysis.stopwords.values.flatten.toSeq.distinct.sorted
  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Literal merge chain for `q_text_bpe_encode` — English digraphs
    * plus three compound merges, each compound operand produced at an
    * earlier rank than every merge consuming it (the property that
    * makes the oracle's rank-ordered replay equivalent to the
    * expression's min-rank loop; see the query comment).
    */
  private[queries] val BpeProbeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "e" -> "r", "i" -> "n", "a" -> "n", "o" -> "n", "r" -> "e",
    "th" -> "e", "an" -> "d", "in" -> "g", "s" -> "t", "e" -> "n", "o" -> "r")

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_text_classifier_score",
      (s, dir) =>
        // scan-speed linear-classifier scoring (the fastText-style gate),
        // portable-hash twin: PolyHash indices + integer formula weights
        // make every logit an exact long DuckDB recomputes. The murmur3
        // production variant is parity-tested against MLlib in
        // QualityClassifierSpec.
        graft.ops.QualityClassifier
          .scorePortable(t(s, dir, "documents"), "text", "doc_id", dims = 4096)
          .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
             |                             t -> length(t) > 0) AS tk
             |  FROM documents),
             |t2 AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
             |h AS (SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
             |        list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT)),
             |        (a, b) -> (a*31 + b) % 1000000007) AS ph FROM t2),
             |w AS (SELECT doc_id, ((ph % 4096 + 1) * 2654435761) % 1001 - 500 AS wt FROM h)
             |SELECT d.doc_id, CAST(COALESCE(s.logit, 0) AS BIGINT) AS logit_scaled
             |FROM documents d
             |LEFT JOIN (SELECT doc_id, sum(wt) AS logit FROM w GROUP BY doc_id) s
             |  USING (doc_id)
             |ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_chunking",
      (s, dir) =>
        graft.ops.Chunking.chunkTokens(
            t(s, dir, "documents"), "doc_id", "text", window = 16, overlap = 4)
          .orderBy("doc_id", "chunk_idx"),
      // stride 12: DuckDB's range(0, n, 12) is the same start set as
      // Spark's sequence(0, n-1, 12); list_slice is 1-based inclusive
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
             |                             t -> length(t) > 0) AS tk
             |  FROM documents),
             |st AS (
             |  SELECT doc_id, tk, unnest(range(0, len(tk), 12)) AS s
             |  FROM toks WHERE len(tk) > 0)
             |SELECT doc_id, CAST(s // 12 AS BIGINT) AS chunk_idx,
             |       array_to_string(list_slice(tk, s + 1, s + 16), ' ') AS chunk,
             |       CAST(least(16, len(tk) - s) AS BIGINT) AS n_tokens
             |FROM st ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    QuerySpec(
      "q_text_token_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"),
            length(col("text")).cast(LongType).as("n_chars_obs"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS BIGINT) AS n_tokens,
             |  CAST(length(text) AS BIGINT) AS n_chars_obs
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_quality",
      (s, dir) => {
        val cols = Seq(col("doc_id")) ++ TextAnalysis.qualityColumns(col("text"))
        t(s, dir, "documents").select(cols: _*).orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, length(text) AS nc,
              |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
              |  FROM documents
              |), m AS (
              |  SELECT doc_id,
              |         CAST(nc AS BIGINT) AS n_chars_obs,
              |         CAST(length(tk) AS BIGINT) AS n_tokens,
              |         CAST(length(list_distinct(tk)) AS BIGINT) AS n_types,
              |         CAST(length(list_filter(tk, t -> t IN (${sqlList(allStop)}))) AS BIGINT) AS n_stop
              |  FROM toks
              |)
              |SELECT doc_id, n_chars_obs, n_tokens, n_types,
              |  round(CAST(n_chars_obs - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS mean_token_len,
              |  round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
              |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS type_token_ratio,
              |  round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.25
              |      + CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.5
              |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.25, 4) AS quality_score
              |FROM m ORDER BY doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_langid",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
          .orderBy("doc_id"),
      Some {
        val langs = TextAnalysis.stopwords.keys.toSeq.sorted
        val hitCols = langs.map(l =>
          s"length(list_filter(tk, t -> t IN (${sqlList(TextAnalysis.stopwords(l))}))) AS h_$l").mkString(",\n         ")
        // first-alphabetical-wins-on-ties, matching TextAnalysis.langId
        val cases = langs.zipWithIndex.map { case (l, i) =>
          val geRest = langs.drop(i + 1).map(o => s"h_$l >= h_$o")
          val conds = (geRest :+ s"h_$l >= 1").mkString(" AND ")
          s"WHEN $conds THEN '$l'"
        }.mkString("\n  ")
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
           |  FROM documents
           |), h AS (
           |  SELECT doc_id,
           |         $hitCols
           |  FROM toks
           |)
           |SELECT doc_id, CASE
           |  $cases
           |  ELSE 'unknown' END AS pred_lang
           |FROM h ORDER BY doc_id""".stripMargin
      }
    ),

    QuerySpec(
      "q_text_fingerprint",
      (s, dir) =>
        // staged projections: hs and wins are each referenced twice in
        // the next select, so CollapseProject keeps them materialized —
        // the single-expression composition re-evaluates the whole md5
        // shingle array per window position (O(n²) per doc, pitfall #1)
        t(s, dir, "documents")
          .select(
            col("doc_id"), col("text"),
            TextAnalysis.winnowShingleHashes(col("text")).as("hs"))
          .select(
            col("doc_id"), col("text"),
            TextAnalysis.winnowMins(col("hs")).as("wins"))
          .select(
            col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp_md5"),
            size(col("wins")).cast(LongType).as("n_winnow"),
            array_min(col("wins")).as("min_winnow_fp"))
          .orderBy("doc_id"),
      Some("""WITH s AS (
             |  SELECT doc_id,
             |         list_transform(range(1, CASE WHEN length(text) - 4 >= 1 THEN length(text) - 3 ELSE 1 END),
             |                        i -> md5(text[i:i+4])) AS hs
             |  FROM documents
             |), w AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, CASE WHEN length(hs) - 3 >= 1 THEN length(hs) - 2 ELSE 1 END),
             |                                      i -> list_min(hs[i:i+3]))) AS fps
             |  FROM s
             |)
             |SELECT d.doc_id, md5(d.text) AS fp_md5,
             |       CAST(length(w.fps) AS BIGINT) AS n_winnow,
             |       list_min(w.fps) AS min_winnow_fp
             |FROM documents d JOIN w ON d.doc_id = w.doc_id
             |ORDER BY d.doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_exact_dedup",
      (s, dir) =>
        DedupOps.exactGroups(t(s, dir, "documents")).orderBy("fp"),
      Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin)
    ),

    QuerySpec(
      "q_text_ngram_jaccard",
      (s, dir) =>
        DedupOps.ngramJaccardPairs(t(s, dir, "documents"), blockCol = "source")
          .orderBy("doc_a", "doc_b"),
      // only overlapping pairs (n_common >= 1) appear — matching the
      // explode/join implementation, which never enumerates the rest
      Some("""WITH g AS (
             |  SELECT source, doc_id,
             |         list_distinct(list_transform(
             |           range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
             |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
             |  FROM (SELECT source, doc_id,
             |               list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents)
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
             |)
             |SELECT doc_a, doc_b, CAST(nc AS BIGINT) AS n_common, CAST(nu AS BIGINT) AS n_union,
             |       round(CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE), 4) AS jaccard
             |FROM p WHERE nc >= 1 ORDER BY doc_a, doc_b""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // pairs → transitive closure → one canonical doc per duplicate
      // group: the step a training-data pipeline actually acts on. The
      // oracle computes the same closure as a recursive CTE, so the
      // distributed min-label propagation is value-checked end to end.
      "q_text_dedup_clusters",
      (s, dir) => {
        // every shared-shingle pair is an edge: the closure then has
        // real multi-hop chains, exercising propagation, not just pair
        // copying (at sf0.01 a jaccard threshold leaves ~1 edge)
        val pairs = DedupOps.ngramJaccardPairs(t(s, dir, "documents"), blockCol = "source")
        DedupOps.connectedComponents(pairs)
          .select(col("node").as("doc_id"), col("label").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE g AS (
             |  SELECT source, doc_id,
             |         list_distinct(list_transform(
             |           range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
             |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
             |  FROM (SELECT source, doc_id,
             |               list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents)
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
             |), und AS (
             |  SELECT doc_a AS a, doc_b AS b FROM p WHERE nc >= 1
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM p WHERE nc >= 1
             |), reach(node, lab) AS (
             |  SELECT a, a FROM und
             |  UNION
             |  SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
             |)
             |SELECT node AS doc_id, min(lab) AS cluster_id
             |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // the composed end-to-end dedup: candidate pairs ≥ 0.5 jaccard →
      // closure → keep min-id per cluster → anti-join losers out; the
      // oracle recomputes the identical pipeline relationally, so the
      // SURVIVING CORPUS itself is value-checked, not just the labels
      "q_text_dedup_corpus",
      (s, dir) =>
        DedupOps.dedupCorpus(t(s, dir, "documents"), blockCol = "source")
          .orderBy("doc_id"),
      Some("""WITH RECURSIVE g AS (
             |  SELECT source, doc_id,
             |         list_distinct(list_transform(
             |           range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
             |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
             |  FROM (SELECT source, doc_id,
             |               list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents)
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
             |), e AS (
             |  SELECT doc_a, doc_b FROM p
             |  WHERE nc >= 1 AND round(CAST(nc AS DOUBLE) / nu, 4) >= 0.5
             |), und AS (
             |  SELECT doc_a AS a, doc_b AS b FROM e
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM e
             |), reach(node, lab) AS (
             |  SELECT a, a FROM und
             |  UNION
             |  SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
             |), losers AS (
             |  SELECT node FROM reach GROUP BY node HAVING node <> min(lab)
             |)
             |SELECT d.* FROM documents d
             |WHERE d.doc_id NOT IN (SELECT node FROM losers)
             |ORDER BY d.doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // Gopher-style repetition quality rules: duplicate 2/3-gram
      // fractions and most-frequent-token share, per document
      "q_text_repetition",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        base.select(Seq(col("doc_id")) ++
          TextAnalysis.repetitionColumns(col("toks")): _*)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, tk,
             |    list_transform(range(1, CASE WHEN length(tk) - 1 >= 1
             |                                 THEN length(tk) ELSE 1 END),
             |                   i -> tk[i] || ' ' || tk[i+1]) AS g2,
             |    list_transform(range(1, CASE WHEN length(tk) - 2 >= 1
             |                                 THEN length(tk) - 1 ELSE 1 END),
             |                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
             |  FROM tk
             |)
             |SELECT doc_id,
             |  round(CASE WHEN length(g2) > 0 THEN
             |    CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE)
             |      / CAST(length(g2) AS DOUBLE) ELSE 0.0 END, 4) AS dup_2gram_frac,
             |  round(CASE WHEN length(g3) > 0 THEN
             |    CAST(length(g3) - length(list_distinct(g3)) AS DOUBLE)
             |      / CAST(length(g3) AS DOUBLE) ELSE 0.0 END, 4) AS dup_3gram_frac,
             |  round(CASE WHEN length(tk) > 0 THEN
             |    CAST(list_max(list_transform(list_distinct(tk),
             |           x -> length(list_filter(tk, y -> y = x)))) AS DOUBLE)
             |      / CAST(length(tk) AS DOUBLE) ELSE 0.0 END, 4) AS top_token_frac
             |FROM g ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      // benchmark decontamination: flag corpus docs sharing any 3-gram
      // with the held-out set (docs with doc_id % 97 = 0 stand in for
      // an eval suite). Spark joins xxhash64(gram) longs, the oracle
      // joins gram strings — same result set, scale-shaped keys.
      "q_text_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.contaminatedDocs(docs, docs.filter(col("doc_id") % 97 === 0))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), g AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(
             |      range(1, CASE WHEN length(tk) - 2 >= 1
             |                    THEN length(tk) - 1 ELSE 1 END),
             |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
             |  FROM tk
             |), bench AS (
             |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
             |), cg AS (
             |  SELECT doc_id, unnest(grams) AS gram FROM g
             |), hits AS (
             |  SELECT doc_id, count(*) AS contaminated_grams
             |  FROM cg JOIN bench USING (gram) GROUP BY doc_id
             |)
             |SELECT d.doc_id,
             |       coalesce(h.contaminated_grams, 0) AS contaminated_grams,
             |       coalesce(h.contaminated_grams, 0) > 0 AS is_contaminated
             |FROM documents d LEFT JOIN hits h USING (doc_id)
             |ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      // FUZZY decontamination: corpus docs whose exact 3-gram Jaccard
      // to ANY benchmark doc (doc_id % 50 = 0 stands in for the eval
      // suite) reaches 0.5, candidates from portable MinHash-LSH bands
      // — signatures, banding, candidate join, and exact verification
      // all replayed value-exactly by the oracle
      "q_text_decontaminate_fuzzy",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.contaminatedDocsFuzzy(
          docs.select("doc_id", "text"),
          docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text"),
          threshold = 0.5)
          .orderBy("doc_id")
      },
      Some {
        val mins = (0 until 8)
          .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
          .mkString(",\n         ")
        val bandRows = (0 until 4)
          .map(j => s"SELECT doc_id, $j AS band_id, " +
            s"(h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band_sig FROM s")
          .mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
           |  FROM documents
           |), g AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
           |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
           |  FROM toks
           |), h AS (
           |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
           |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
           |    (a, b) -> (a*31 + b) % 1000000007) AS g64
           |  FROM g
           |), hd AS (
           |  SELECT DISTINCT doc_id, g64 FROM h
           |), s AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM h GROUP BY doc_id
           |), bands AS (
           |  $bandRows
           |), cand AS (
           |  SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bench_id
           |  FROM bands c JOIN bands b USING (band_id, band_sig)
           |  WHERE b.doc_id % 50 = 0
           |), cn AS (
           |  SELECT doc_id AS cid, count(*) AS n_a FROM hd GROUP BY 1
           |), bn AS (
           |  SELECT doc_id AS bench_id, count(*) AS n_b FROM hd
           |  WHERE doc_id % 50 = 0 GROUP BY 1
           |), common AS (
           |  SELECT cand.cid, cand.bench_id, count(*) AS n_common
           |  FROM cand
           |  JOIN hd ca ON ca.doc_id = cand.cid
           |  JOIN hd ba ON ba.doc_id = cand.bench_id AND ba.g64 = ca.g64
           |  GROUP BY 1, 2
           |), jac AS (
           |  SELECT cid, round(CAST(n_common AS DOUBLE)
           |         / CAST(n_a + n_b - n_common AS DOUBLE), 4) AS j
           |  FROM common JOIN cn USING (cid) JOIN bn USING (bench_id)
           |), perdoc AS (
           |  SELECT cid, max(j) AS best_jaccard,
           |         count(CASE WHEN j >= 0.5 THEN 1 END) AS fuzzy_matches
           |  FROM jac GROUP BY 1
           |)
           |SELECT d.doc_id,
           |       coalesce(p.best_jaccard, 0.0) AS best_jaccard,
           |       CAST(coalesce(p.fuzzy_matches, 0) AS BIGINT) AS fuzzy_matches,
           |       coalesce(p.fuzzy_matches, 0) > 0 AS is_contaminated
           |FROM documents d LEFT JOIN perdoc p ON p.cid = d.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }
    ),

    QuerySpec(
      "q_text_word_freq",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .select(explode(col("toks")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(20),
      Some("""SELECT word, count(*) AS n
             |FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS word
             |      FROM documents)
             |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin)
    ),

    QuerySpec(
      "q_text_vocab_encode",
      // frequency-ranked vocabulary + order-preserving id encoding (the
      // tokenize-to-ids bridge before packing): rank order (freq DESC,
      // token ASC) is a deterministic total order both engines agree
      // on, so ids — and therefore every encoded array — value-check
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val vocab = graft.ops.Vocabulary.build(docs, "text", maxSize = 10000)
        // the id array is value-checked as a CSV string: the driver's
        // pandas-side compare sorts every output column, and a list
        // column is unhashable there (broke CORRECTNESS_r07) — the csv
        // serialization is order-exact, so nothing is lost
        graft.ops.Vocabulary.encode(docs, "doc_id", "text", vocab)
          .select(col("doc_id"),
            array_join(expr("transform(token_ids, x -> cast(x AS string))"), ",")
              .as("token_ids_csv"),
            col("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), toks AS (
             |  SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord
             |  FROM tk
             |), cnt AS (
             |  SELECT tok, count(*) AS c FROM toks GROUP BY 1
             |), voc AS (
             |  SELECT tok,
             |         CAST(row_number() OVER (ORDER BY c DESC, tok) - 1 AS BIGINT) AS tid
             |  FROM cnt
             |), enc AS (
             |  SELECT t.doc_id, list(v.tid ORDER BY t.ord) AS token_ids
             |  FROM toks t JOIN voc v ON t.tok = v.tok GROUP BY 1
             |)
             |SELECT k.doc_id,
             |       array_to_string(coalesce(e.token_ids, CAST([] AS BIGINT[])), ',') AS token_ids_csv,
             |       CAST(coalesce(length(e.token_ids), 0) AS BIGINT) AS n_tokens
             |FROM tk k LEFT JOIN enc e USING (doc_id) ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_pack_sequences",
      // GPT-style sequence packing: concat all docs' tokens in doc_id
      // order, cut into 512-token blocks. DuckDB replays the global
      // prefix-sum + reassembly, so block boundaries, contents, and the
      // short final block are all value-checked
      (s, dir) =>
        graft.ops.Chunking.packSequences(
            t(s, dir, "documents"), "doc_id", "text", blockSize = 512)
          .orderBy("block_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), off AS (
             |  SELECT doc_id,
             |         coalesce(sum(length(tk)) OVER (ORDER BY doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             |  FROM tk
             |), pos AS (
             |  SELECT o.start + t.ord - 1 AS p, t.tok
             |  FROM (SELECT doc_id, unnest(tk) AS tok,
             |               generate_subscripts(tk, 1) AS ord FROM tk) t
             |  JOIN off o USING (doc_id)
             |)
             |SELECT CAST(p // 512 AS BIGINT) AS block_id,
             |       string_agg(tok, ' ' ORDER BY p) AS text,
             |       count(*) AS n_tokens
             |FROM pos GROUP BY 1 ORDER BY block_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_curation_full",
      // curateCorpus + the round-7 stages: … → near-dup → span-level
      // dedup → LM-perplexity gate (threshold 3.55 ≈ the p92 of the
      // post-pipeline nll distribution at sf0.01, so the tail actually
      // drops). DuckDB recomputes all seven stages; drift in any stage
      // OR in their composition breaks the hash.
      (s, dir) => {
        val c = graft.ops.Curation.curateCorpusFull(
          t(s, dir, "documents"),
          nearDupThreshold = 0.5,
          maxAvgNll = 3.55,
          nearDupBlockCol = Some("source"))
        val out = c.frame.orderBy("doc_id")
        // the gate's own cache sweep releases the pipeline diamonds
        out
      },
      Some(s"""WITH RECURSIVE tk0 AS (
             |  SELECT doc_id, source,
             |         list_filter(string_split(text,' '), t -> length(t)>0) AS tk
             |  FROM documents
             |), sig AS (
             |  SELECT doc_id, source, tk,
             |    list_transform(range(1, CASE WHEN length(tk)-1 >= 1 THEN length(tk) ELSE 1 END),
             |                   i -> tk[i] || ' ' || tk[i+1]) AS g2
             |  FROM tk0
             |), gated AS (
             |  SELECT doc_id, source, tk FROM sig
             |  WHERE CAST(length(tk) AS BIGINT) >= 20
             |    AND round(CAST(length(list_distinct(tk)) AS DOUBLE)
             |              / CAST(length(tk) AS DOUBLE), 4) >= 0.35
             |    AND round(CASE WHEN length(tk) > 0 THEN
             |      CAST(list_max(list_transform(list_distinct(tk),
             |             x -> length(list_filter(tk, y -> y = x)))) AS DOUBLE)
             |        / CAST(length(tk) AS DOUBLE) ELSE 0.0 END, 4) <= 0.12
             |    AND round(CASE WHEN length(g2) > 0 THEN
             |      CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE)
             |        / CAST(length(g2) AS DOUBLE) ELSE 0.0 END, 4) <= 0.06
             |), toks AS (
             |  SELECT doc_id, source, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord
             |  FROM gated
             |), lines AS (
             |  SELECT doc_id, source, CAST((ord-1)//8 AS BIGINT) AS line_no,
             |         string_agg(tok, ' ' ORDER BY ord) AS line
             |  FROM toks GROUP BY 1, 2, 3
             |), dfreq AS (
             |  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) <= 1
             |), clean AS (
             |  SELECT l.doc_id, l.source, string_agg(l.line, ' ' ORDER BY l.line_no) AS text
             |  FROM lines l JOIN dfreq USING (line) GROUP BY 1, 2
             |), ctk AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      range(1, CASE WHEN length(tk2) - 2 >= 1 THEN length(tk2) - 1 ELSE 1 END),
             |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2])) AS grams
             |  FROM (SELECT doc_id, source,
             |               list_filter(string_split(text,' '), t -> length(t)>0) AS tk2
             |        FROM clean)
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS da, b.doc_id AS db,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM ctk a JOIN ctk b ON a.source = b.source AND a.doc_id < b.doc_id
             |), e AS (
             |  SELECT da, db FROM p WHERE nc >= 1 AND round(CAST(nc AS DOUBLE) / nu, 4) >= 0.5
             |), und AS (
             |  SELECT da AS a, db AS b FROM e
             |  UNION ALL
             |  SELECT db, da FROM e
             |), reach(node, lab) AS (
             |  SELECT a, a FROM und
             |  UNION
             |  SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
             |), losers AS (
             |  SELECT node FROM reach GROUP BY node HAVING node <> min(lab)
             |), surv AS (
             |  SELECT doc_id, text FROM clean WHERE doc_id NOT IN (SELECT node FROM losers)
             |), stoks AS (
             |  SELECT doc_id, list_filter(string_split(text,' '), t->length(t)>0) AS tk FROM surv
             |), sspans AS (
             |  SELECT doc_id, p, array_to_string(list_slice(tk, p+1, p+8),' ') AS span
             |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-8)) AS p FROM stoks)
             |), sdup AS (
             |  SELECT span FROM (SELECT span, count(DISTINCT doc_id) AS df FROM sspans GROUP BY 1)
             |  WHERE df >= 2
             |), sstarts AS (
             |  SELECT DISTINCT s.doc_id, s.p FROM sspans s JOIN sdup USING (span)
             |), scov AS (
             |  SELECT DISTINCT doc_id, unnest(generate_series(p, p + 7)) AS i FROM sstarts
             |), spos AS (
             |  SELECT doc_id, i, tk[i + 1] AS tok
             |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1)) AS i FROM stoks)
             |), skeep AS (
             |  SELECT p.doc_id, p.i, p.tok FROM spos p
             |  LEFT JOIN scov c ON p.doc_id = c.doc_id AND p.i = c.i WHERE c.i IS NULL
             |), sagg AS (
             |  SELECT doc_id, string_agg(tok,' ' ORDER BY i) AS text FROM skeep GROUP BY 1
             |), masked AS (
             |  SELECT t.doc_id, coalesce(a.text,'') AS text FROM stoks t LEFT JOIN sagg a USING (doc_id)
             |), mtk AS (
             |  SELECT m.doc_id, d.lang, list_filter(string_split(m.text,' '), t->length(t)>0) AS tk
             |  FROM masked m JOIN documents d USING (doc_id)
             |), refbi AS (
             |  SELECT tk[i + 1] AS w1, tk[i + 2] AS w2
             |  FROM (SELECT tk, unnest(generate_series(0, len(tk) - 2)) AS i FROM mtk WHERE lang = 'en')
             |), c12 AS (SELECT w1, w2, count(*) AS c FROM refbi GROUP BY 1, 2),
             |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY 1),
             |voc AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(tk) AS t FROM mtk WHERE lang = 'en')),
             |docbi AS (
             |  SELECT doc_id, tk[i + 1] AS w1, tk[i + 2] AS w2
             |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 2)) AS i FROM mtk)
             |), sc2 AS (
             |  SELECT d.doc_id,
             |    CAST(round(ln(CAST(coalesce(c12.c, 0) + 1 AS DOUBLE)
             |                  / CAST(coalesce(c1.c1, 0) + voc.v AS DOUBLE)) * 10000.0) AS BIGINT) AS s
             |  FROM docbi d
             |  LEFT JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
             |  LEFT JOIN c1 ON d.w1 = c1.w1
             |  CROSS JOIN voc
             |), agg2 AS (SELECT doc_id, sum(s) AS s, count(*) AS n FROM sc2 GROUP BY 1),
             |scored AS (SELECT doc_id, -(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) AS avg_nll
             |           FROM agg2)
             |SELECT m.doc_id, m.text FROM masked m
             |JOIN scored USING (doc_id) WHERE avg_nll <= 3.55
             |ORDER BY m.doc_id""".stripMargin),
      // the heaviest composed pipeline (7 chained corpus stages):
      // bench-tracked so a regression in the span-dedup / perplexity
      // stages is visible per round (VERDICT r10 #7)
      bench = true
    ),

    QuerySpec(
      "q_text_lm_perplexity",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val m = graft.ops.NgramLM.fitBigrams(docs.filter(col("lang") === "en"))
        graft.ops.NgramLM.scorePerplexity(docs, m).orderBy("doc_id")
      },
      // same model: add-one bigram LM fit on the en slice, scored over
      // all docs; per-bigram ln rounds to 1e-4 longs before the sum
      Some("""WITH toks AS (SELECT doc_id, lang,
             |          list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents),
             |refbi AS (SELECT tk[i + 1] AS w1, tk[i + 2] AS w2
             |          FROM (SELECT tk, unnest(generate_series(0, len(tk) - 2)) AS i
             |                FROM toks WHERE lang = 'en')),
             |c12 AS (SELECT w1, w2, count(*) AS c FROM refbi GROUP BY 1, 2),
             |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY 1),
             |voc AS (SELECT count(DISTINCT t) AS v FROM (
             |          SELECT unnest(tk) AS t FROM toks WHERE lang = 'en')),
             |docbi AS (SELECT doc_id, tk[i + 1] AS w1, tk[i + 2] AS w2
             |          FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 2)) AS i
             |                FROM toks)),
             |sc AS (SELECT d.doc_id,
             |         CAST(round(ln(CAST(coalesce(c12.c, 0) + 1 AS DOUBLE)
             |                       / CAST(coalesce(c1.c1, 0) + voc.v AS DOUBLE)) * 10000.0)
             |              AS BIGINT) AS s
             |       FROM docbi d
             |       LEFT JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
             |       LEFT JOIN c1 ON d.w1 = c1.w1
             |       CROSS JOIN voc),
             |agg AS (SELECT doc_id, sum(s) AS s, count(*) AS n FROM sc GROUP BY 1)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
             |       -(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) AS avg_nll
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_span_dedup",
      (s, dir) =>
        graft.ops.DedupOps.maskDuplicatedSpans(
          t(s, dir, "documents").select("doc_id", "text"),
          window = 8, minDocs = 2)
          .select("doc_id", "text", "n_masked")
          .orderBy("doc_id"),
      // identical algorithm: sliding 8-token spans, exact-string df >= 2,
      // covered-position union, reassembly from surviving tokens
      Some("""WITH toks AS (SELECT doc_id,
             |          list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents),
             |spans AS (SELECT doc_id, p, array_to_string(list_slice(tk, p + 1, p + 8), ' ') AS span
             |          FROM (SELECT doc_id, tk,
             |                  unnest(generate_series(0, len(tk) - 8)) AS p
             |                FROM toks)),
             |dup AS (SELECT span FROM (
             |          SELECT span, count(DISTINCT doc_id) AS df FROM spans GROUP BY 1)
             |        WHERE df >= 2),
             |starts AS (SELECT DISTINCT s.doc_id, s.p FROM spans s JOIN dup USING (span)),
             |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(p, p + 7)) AS i FROM starts),
             |pos AS (SELECT doc_id, i, tk[i + 1] AS tok
             |        FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1)) AS i
             |              FROM toks)),
             |keep AS (SELECT p.doc_id, p.i, p.tok FROM pos p
             |         LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.i = c.i
             |         WHERE c.i IS NULL),
             |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt, count(*) AS kept
             |        FROM keep GROUP BY 1)
             |SELECT t.doc_id, coalesce(a.txt, '') AS text,
             |       CAST(len(t.tk) - coalesce(a.kept, 0) AS BIGINT) AS n_masked
             |FROM toks t LEFT JOIN agg a USING (doc_id)
             |ORDER BY t.doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_bpe",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        // learn (one agg + vocabulary-scale driver loop), then encode as
        // a codegen projection; the oracle checks the word-count stage
        // exactly and pins the encode-phase invariants as contract
        // booleans (byte-exact reconstruction; subword count strictly
        // between word count and char count — DuckDB cannot run the
        // merge loop itself)
        val model = graft.ops.BpeTokenizer.learn(docs, numMerges = 200)
        val checked = docs
          .select(
            graft.ops.TextAnalysis.tokens(col("text")).as("w"),
            graft.ops.BpeTokenizer.encodeText(col("text"), model).as("sub"))
          .select(
            (array_join(col("w"), "") === array_join(col("sub"), "")).as("ok"),
            size(col("w")).cast(org.apache.spark.sql.types.LongType).as("nw"),
            size(col("sub")).cast(org.apache.spark.sql.types.LongType).as("ns"),
            aggregate(col("w"), lit(0L), (a, x) => a + length(x)).as("nc"))
          .agg(min("ok").as("ok"), sum("nw").as("nw"),
            sum("ns").as("ns"), sum("nc").as("nc"))
          .select(
            col("ok").as("reconstruction_ok"),
            (col("ns") >= col("nw") && col("ns") < col("nc")).as("compresses"))
        graft.ops.BpeTokenizer.wordCounts(docs)
          .orderBy(col("n").desc, col("word").asc).limit(10)
          .crossJoin(broadcast(checked))
          .orderBy(col("n").desc, col("word").asc)
      },
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(string_split(text, ' '),
             |                t -> length(t) > 0)) AS word
             |  FROM documents),
             |wc AS (SELECT word, count(*) AS n FROM toks GROUP BY 1)
             |SELECT word, n, true AS reconstruction_ok, true AS compresses
             |FROM wc ORDER BY n DESC, word ASC LIMIT 10""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_dsir",
      (s, dir) => {
        // DSIR importance scores (Xie et al. 2023): target model = the
        // English slice, raw model = the whole corpus; hashed unigram+
        // bigram features via the portable PolyHash so DuckDB replays
        // the entire fit+score algebra value-exactly (per-bucket
        // log-ratios round to 1e-4 longs BEFORE the per-doc sum)
        val docs = t(s, dir, "documents")
        graft.ops.Dsir.scores(
          docs.select("doc_id", "text"),
          docs.filter(col("lang") === "en").select("text"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |         list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tk
             |  FROM documents),
             |uni AS (SELECT doc_id, lang, unnest(tk) AS g FROM toks),
             |bi AS (SELECT doc_id, lang, tk[i + 1] || ' ' || tk[i + 2] AS g
             |       FROM (SELECT doc_id, lang, tk, unnest(generate_series(0, len(tk) - 2)) AS i
             |             FROM toks)),
             |feats AS (SELECT doc_id, lang,
             |            list_reduce(list_prepend(0::BIGINT,
             |              list_transform(string_split(g, ''), c -> ascii(c)::BIGINT)),
             |              (a, b) -> (a*31 + b) % 1000000007) % 4096 AS bucket
             |          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
             |p AS (SELECT bucket, count(*) AS cp FROM feats WHERE lang = 'en' GROUP BY 1),
             |q AS (SELECT bucket, count(*) AS cq FROM feats GROUP BY 1),
             |np AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats WHERE lang = 'en'),
             |nq AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
             |ratio AS (SELECT q.bucket,
             |            CAST(round((ln((coalesce(p.cp, 0) + 1.0) / (np.n + 4096.0))
             |                        - ln((q.cq + 1.0) / (nq.n + 4096.0))) * 10000.0) AS BIGINT) AS delta
             |          FROM q LEFT JOIN p USING (bucket) CROSS JOIN np CROSS JOIN nq),
             |sc AS (SELECT f.doc_id, sum(r.delta) AS s FROM feats f JOIN ratio r USING (bucket) GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(s.s, 0) AS DOUBLE) / 10000.0 AS log_ratio
             |FROM documents d LEFT JOIN sc s USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_bpe_encode",
      (s, dir) => {
        // VALUE-checks the codegen encode path (VERDICT r9 #7): a
        // LITERAL merge list (training's learned merges cannot be
        // derived in a static oracle, but the encode loop can be
        // replayed exactly), applied by the native BpeEncode expression
        // to the corpus's 200 most frequent words; DuckDB replays the
        // merges with a recursive CTE. Equivalence argument for the
        // rank-ordered replay vs the expression's min-rank-present
        // loop: applying merge k creates only pairs involving the new
        // symbol l_k||r_k, and no merge of rank < k references that
        // symbol (checked for this list: each compound operand — th,
        // in, an — is produced by an EARLIER rank than every merge
        // consuming it), so ascending-rank single passes and the
        // min-rank loop compute identical subwords; within one pass
        // both sides merge occurrences left-to-right, non-overlapping.
        val model = graft.ops.BpeTokenizer.BpeModel(TextOps.BpeProbeMerges)
        val sub = graft.ops.BpeTokenizer.encode(array(col("word")), model)
        graft.ops.BpeTokenizer
          .wordCounts(t(s, dir, "documents").select("doc_id", "text"))
          .orderBy(col("n").desc, col("word").asc).limit(200)
          .select(
            col("word"), col("n"),
            array_join(sub, ",").as("subwords"),
            size(sub).cast(LongType).as("n_sub"))
          .orderBy(col("n").desc, col("word").asc)
      },
      Some {
        val mergeRows = TextOps.BpeProbeMerges.zipWithIndex
          .map { case ((l, r), i) => s"(${i + 1}, '$l', '$r')" }.mkString(", ")
        val n = TextOps.BpeProbeMerges.size
        // acc encodes the symbol list as chr(31)-separated text; one
        // recursive step applies merge rank step+1 left-to-right
        // (merging = appending WITHOUT the separator)
        s"""WITH RECURSIVE wc AS (
           |  SELECT word, count(*) AS n FROM (
           |    SELECT unnest(list_filter(string_split(text, ' '),
           |                  t -> length(t) > 0)) AS word
           |    FROM documents) GROUP BY 1),
           |top AS (SELECT word, n FROM wc ORDER BY n DESC, word ASC LIMIT 200),
           |merges(rank, l, r) AS (VALUES $mergeRows),
           |enc AS (
           |  SELECT word, n,
           |         chr(31) || array_to_string(string_split(word, ''), chr(31)) AS acc,
           |         0 AS step
           |  FROM top
           |  UNION ALL
           |  SELECT e.word, e.n,
           |         list_reduce(
           |           list_prepend('', list_filter(string_split(e.acc, chr(31)),
           |                                        x -> x <> '')),
           |           (a, b) -> CASE WHEN ends_with(a, chr(31) || m.l) AND b = m.r
           |                     THEN a || b ELSE a || chr(31) || b END) AS acc,
           |         e.step + 1
           |  FROM enc e JOIN merges m ON m.rank = e.step + 1
           |  WHERE e.step < $n)
           |SELECT word, CAST(n AS BIGINT) AS n,
           |       array_to_string(list_filter(string_split(acc, chr(31)), x -> x <> ''), ',') AS subwords,
           |       CAST(len(list_filter(string_split(acc, chr(31)), x -> x <> '')) AS BIGINT) AS n_sub
           |FROM enc WHERE step = $n ORDER BY n DESC, word ASC""".stripMargin
      }
    ),

    QuerySpec(
      "q_text_span_keepfirst",
      (s, dir) =>
        graft.ops.DedupOps.maskDuplicatedSpans(
          t(s, dir, "documents").select("doc_id", "text"),
          window = 8, minDocs = 2, keepFirst = true)
          .select("doc_id", "text", "n_masked")
          .orderBy("doc_id"),
      // same algorithm as q_text_span_dedup plus the keep-one-copy rule:
      // each duplicated span's smallest-doc_id occurrence is exempt
      Some("""WITH toks AS (SELECT doc_id,
             |          list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |        FROM documents),
             |spans AS (SELECT doc_id, p, array_to_string(list_slice(tk, p + 1, p + 8), ' ') AS span
             |          FROM (SELECT doc_id, tk,
             |                  unnest(generate_series(0, len(tk) - 8)) AS p
             |                FROM toks)),
             |dup AS (SELECT span, owner FROM (
             |          SELECT span, count(DISTINCT doc_id) AS df,
             |                 min(doc_id) AS owner
             |          FROM spans GROUP BY 1)
             |        WHERE df >= 2),
             |starts AS (SELECT DISTINCT s.doc_id, s.p FROM spans s
             |           JOIN dup USING (span) WHERE s.doc_id <> dup.owner),
             |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(p, p + 7)) AS i FROM starts),
             |pos AS (SELECT doc_id, i, tk[i + 1] AS tok
             |        FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1)) AS i
             |              FROM toks)),
             |keep AS (SELECT p.doc_id, p.i, p.tok FROM pos p
             |         LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.i = c.i
             |         WHERE c.i IS NULL),
             |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt, count(*) AS kept
             |        FROM keep GROUP BY 1)
             |SELECT t.doc_id, coalesce(a.txt, '') AS text,
             |       CAST(len(t.tk) - coalesce(a.kept, 0) AS BIGINT) AS n_masked
             |FROM toks t LEFT JOIN agg a USING (doc_id)
             |ORDER BY t.doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_bm25",
      (s, dir) =>
        graft.ops.Retrieval.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq((0L, "spark window merge"), (1L, "customer join agg"),
            (2L, "vector stream query data")),
          topK = 10)
          .orderBy("q_id", "rnk"),
      // Same formula, same parenthesization, same 1e-4 pre-sum rounding.
      // All literals that are inexact in binary (k1=1.2) are CAST to
      // DOUBLE before arithmetic so DuckDB doesn't fold them in DECIMAL.
      Some("""WITH q(q_id, qtext) AS (VALUES (0, 'spark window merge'),
             |  (1, 'customer join agg'), (2, 'vector stream query data')),
             |qt AS (SELECT DISTINCT q_id,
             |         unnest(list_filter(string_split(qtext, ' '), t -> length(t) > 0)) AS term
             |       FROM q),
             |toks AS (SELECT doc_id,
             |           len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS dl,
             |           unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS term
             |         FROM documents),
             |post AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
             |         FROM toks GROUP BY 1, 2),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sdl
             |          FROM (SELECT doc_id, max(dl) AS dl FROM post GROUP BY 1)),
             |dfq AS (SELECT term, count(*) AS df FROM post
             |        WHERE term IN (SELECT term FROM qt) GROUP BY 1),
             |sc AS (SELECT qt.q_id, post.doc_id,
             |         CAST(round(
             |           ln(1.0 + (stats.n - CAST(dfq.df AS DOUBLE) + 0.5) / (CAST(dfq.df AS DOUBLE) + 0.5))
             |           * (CAST(post.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)
             |              / (CAST(post.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
             |                 * (0.25 + 0.75 * (CAST(post.dl AS DOUBLE) / (stats.sdl / stats.n)))))
             |           * 10000.0) AS BIGINT) AS s
             |       FROM qt JOIN post USING (term) JOIN dfq USING (term) CROSS JOIN stats),
             |agg AS (SELECT q_id, doc_id, sum(s) AS s FROM sc GROUP BY 1, 2),
             |r AS (SELECT q_id, doc_id, s / 10000.0 AS score,
             |        row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id) AS rnk
             |      FROM agg)
             |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, CAST(rnk AS BIGINT) AS rnk, score
             |FROM r WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin),
      bench = true
    ),

    QuerySpec(
      // Hybrid retrieval via reciprocal-rank fusion: BM25 and
      // distinct-term-overlap lists over the SAME postings index, fused
      // by 1/(60+rank) — the standard way to combine retrievers whose
      // score scales are incomparable (only ranks cross the boundary).
      // Both input lists and the fusion are individually deterministic
      // (scaled-long sums, integer overlap, lower-doc-id ties), so the
      // whole two-retriever pipeline is value-checked end to end.
      "q_text_rrf_fusion",
      (s, dir) => {
        val qs = Seq((0L, "spark window merge"), (1L, "customer join agg"),
          (2L, "vector stream query data"))
        val post = graft.ops.Retrieval.postings(t(s, dir, "documents"), "doc_id", "text")
        graft.ops.Retrieval.rrfFuse(
          Seq(graft.ops.Retrieval.searchPostings(post, "doc_id", qs, topK = 10),
            graft.ops.Retrieval.overlapTopK(post, "doc_id", qs, topK = 10)),
          "doc_id", topK = 5)
          .orderBy("q_id", "rnk")
      },
      Some("""WITH q(q_id, qtext) AS (VALUES (0, 'spark window merge'),
             |  (1, 'customer join agg'), (2, 'vector stream query data')),
             |qt AS (SELECT DISTINCT q_id,
             |         unnest(list_filter(string_split(qtext, ' '), t -> length(t) > 0)) AS term
             |       FROM q),
             |toks AS (SELECT doc_id,
             |           len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS dl,
             |           unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS term
             |         FROM documents),
             |post AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
             |         FROM toks GROUP BY 1, 2),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sdl
             |          FROM (SELECT doc_id, max(dl) AS dl FROM post GROUP BY 1)),
             |dfq AS (SELECT term, count(*) AS df FROM post
             |        WHERE term IN (SELECT term FROM qt) GROUP BY 1),
             |sc AS (SELECT qt.q_id, post.doc_id,
             |         CAST(round(
             |           ln(1.0 + (stats.n - CAST(dfq.df AS DOUBLE) + 0.5) / (CAST(dfq.df AS DOUBLE) + 0.5))
             |           * (CAST(post.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)
             |              / (CAST(post.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
             |                 * (0.25 + 0.75 * (CAST(post.dl AS DOUBLE) / (stats.sdl / stats.n)))))
             |           * 10000.0) AS BIGINT) AS s
             |       FROM qt JOIN post USING (term) JOIN dfq USING (term) CROSS JOIN stats),
             |agg AS (SELECT q_id, doc_id, sum(s) AS s FROM sc GROUP BY 1, 2),
             |bm AS (SELECT q_id, doc_id,
             |         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id) AS rnk
             |       FROM agg),
             |ovr AS (SELECT q_id, doc_id, count(*) AS ov
             |        FROM qt JOIN post USING (term) GROUP BY 1, 2),
             |ovrr AS (SELECT q_id, doc_id,
             |          row_number() OVER (PARTITION BY q_id ORDER BY ov DESC, doc_id) AS rnk
             |         FROM ovr),
             |lists AS (
             |  SELECT q_id, doc_id, CAST(round(1000000.0 / (60 + rnk)) AS BIGINT) AS c
             |  FROM bm WHERE rnk <= 10
             |  UNION ALL
             |  SELECT q_id, doc_id, CAST(round(1000000.0 / (60 + rnk)) AS BIGINT)
             |  FROM ovrr WHERE rnk <= 10
             |),
             |f AS (SELECT q_id, doc_id, sum(c) AS s FROM lists GROUP BY 1, 2),
             |fr AS (SELECT q_id, doc_id, CAST(s AS DOUBLE) / 1000000.0 AS rrf,
             |         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id) AS rnk
             |       FROM f)
             |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, CAST(rnk AS BIGINT) AS rnk, rrf
             |FROM fr WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)
    ),

    QuerySpec(
      "q_text_length_hist",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy((floor(col("n_chars") / 100) * 100).cast(LongType).as("len_bucket"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("len_bucket"),
      Some("""SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket,
             |       count(*) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    QuerySpec(
      "q_text_minhash_bands",
      (s, dir) =>
        DedupOps.lshBands(DedupOps.minHashSignatures(t(s, dir, "documents")))
          .orderBy("id", "band_id"),
      oracle = None, // murmur3 signatures: not reproducible in DuckDB
      bench = true
    ),

    QuerySpec(
      "q_text_simhash",
      (s, dir) =>
        DedupOps.simHashDf(t(s, dir, "documents"))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id"),
      oracle = None, // xxhash64-based: not reproducible in DuckDB
      bench = true
    ),

    QuerySpec(
      "q_text_bpe_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(TextAnalysis.bpeTokens(col("text"))).cast(LongType).as("n_subtok"),
            size(regexp_extract_all(col("text"), lit(" ?[A-Za-z]+"), lit(0)))
              .cast(LongType).as("n_alpha"),
            size(regexp_extract_all(col("text"), lit(" ?[0-9]+"), lit(0)))
              .cast(LongType).as("n_num"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS BIGINT) AS n_subtok,
              |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+')) AS BIGINT) AS n_alpha,
              |  CAST(len(regexp_extract_all(text, ' ?[0-9]+')) AS BIGINT) AS n_num
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // ----- portable-hash twins: the same minhash/simhash algorithms over
    // DedupOps.polyHash, whose polynomial fold DuckDB can reproduce
    // exactly — giving the hash-dependent operator family full
    // value-level oracles (the xxhash64 variants above stay rows-only
    // and carry the bench flag).

    QuerySpec(
      "q_text_minhash_portable",
      (s, dir) => {
        val sig = DedupOps.minHashSignaturesPortable(t(s, dir, "documents"))
        // portable banding: band j pairs two signature slots
        val bandCols = (0 until 4).map(j =>
          ((col(s"h${2 * j}") * 31L + col(s"h${2 * j + 1}")) % 1000000007L).as(s"band$j"))
        sig.select(Seq(col("id").as("doc_id")) ++
            (0 until 8).map(i => col(s"h$i")) ++ bandCols: _*)
          .orderBy("doc_id")
      },
      Some {
        val mins = (0 until 8)
          .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
          .mkString(",\n         ")
        val bands = (0 until 4)
          .map(j => s"(h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band$j")
          .mkString(",\n       ")
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
           |  FROM documents
           |), g AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
           |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
           |  FROM toks
           |), h AS (
           |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
           |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
           |    (a, b) -> (a*31 + b) % 1000000007) AS g64
           |  FROM g
           |), s AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM h GROUP BY doc_id
           |)
           |SELECT doc_id, ${(0 until 8).map(i => s"h$i").mkString(", ")},
           |       $bands
           |FROM s ORDER BY doc_id""".stripMargin
      }
    ),

    QuerySpec(
      // MEASURED LSH recall curve (ADVICE r10: the fixed 8-hash/4-band
      // MinHash surfaces a pair at true Jaccard j with probability
      // ≈ 1-(1-j²)⁴ — ~68% at j=0.5 — and callers must not read the
      // exact-verify stage as a completeness guarantee). This query
      // turns that documented bound into a per-corpus ARTIFACT: for
      // every gram-sharing pair, bucket the exact 3-gram Jaccard and
      // report the fraction the portable banding actually surfaced
      // next to the theoretical expectation — the calibration table an
      // operator reads before choosing a dedup threshold. Both sides
      // are deterministic (polyHash grams replay in DuckDB), so recall
      // itself is value-checked. Scale shape: exact pairs come from the
      // df-capped gram join (the q_text_ngram_jaccard path), candidates
      // from the banded equality self-join — calibration runs on a
      // sample corpus by construction, never the full 100 TB.
      "q_text_lsh_calibration",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = DedupOps.ngramJaccardPairs(docs, blockCol = "source")
        val bands = DedupOps.minHashBandsPortable(docs)
        val cands = bands.as("a").join(bands.as("b"),
            col("a.band_id") === col("b.band_id") &&
              col("a.band_sig") === col("b.band_sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .withColumn("hit", lit(1L))
        val expected10k = round(
          (lit(1.0) - pow(lit(1.0) - col("jaccard") * col("jaccard"), 4.0)) * 10000.0)
          .cast("long")
        pairs
          .withColumn("j_bucket", floor(col("jaccard") * 10).cast("int"))
          .withColumn("e10k", expected10k)
          .join(cands, Seq("doc_a", "doc_b"), "left")
          .groupBy("j_bucket")
          .agg(
            count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_surfaced"),
            round(sum(coalesce(col("hit"), lit(0L))).cast("double")
              / count(lit(1)), 4).as("recall"),
            // unscaled-long sum + one division: float-order-free
            round(sum(col("e10k")).cast("double")
              / (count(lit(1)) * 10000.0), 4).as("expected_recall"))
          .orderBy("j_bucket")
      },
      Some {
        val mins = (0 until 8)
          .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
          .mkString(", ")
        val bandRows = (0 until 4)
          .map(j => s"SELECT doc_id, $j AS band_id, (h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band_sig FROM s")
          .mkString("\n             |  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT source, doc_id,
           |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
           |  FROM documents
           |), g AS (
           |  SELECT source, doc_id,
           |         list_distinct(list_transform(
           |           range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
           |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
           |  FROM toks
           |  WHERE length(grams) > 0
           |), p AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
           |         length(a.grams) + length(b.grams)
           |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
           |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
           |), pj AS (
           |  SELECT doc_a, doc_b, round(CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE), 4) AS jaccard
           |  FROM p WHERE nc >= 1
           |), eg AS (
           |  SELECT doc_id, unnest(grams) AS gram FROM g
           |), h AS (
           |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
           |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
           |    (a, b) -> (a*31 + b) % 1000000007) AS g64
           |  FROM eg
           |), s AS (
           |  SELECT doc_id, $mins FROM h GROUP BY doc_id
           |), bands AS (
           |  $bandRows
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
           |   AND a.doc_id < b.doc_id
           |)
           |SELECT CAST(floor(jaccard * 10) AS INT) AS j_bucket,
           |       count(*) AS n_pairs,
           |       CAST(sum(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_surfaced,
           |       round(CAST(sum(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
           |             / count(*), 4) AS recall,
           |       round(CAST(sum(CAST(round((1 - power(1 - jaccard*jaccard, 4)) * 10000) AS BIGINT)) AS DOUBLE)
           |             / (count(*) * 10000.0), 4) AS expected_recall
           |FROM pj LEFT JOIN cand c USING (doc_a, doc_b)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }
    ),

    {
      // DERIVED-banding calibration (VERDICT r12 #1): the banding below is
      // NOT hand-picked — it is bandsForThreshold(0.7, 0.9, 64)'s S-curve
      // solve, evaluated once here so the SAME (numHashes, bands) shape
      // parameterizes both the Spark pipeline and the DuckDB oracle. The
      // solve maximizes row width within the hash budget, so this exercises
      // minHashBandsPortable's generalized fold at a non-default width
      // (r = 4 vs the default r = 2). Output mirrors
      // q_text_lsh_calibration — measured vs theoretical recall per exact-
      // Jaccard bucket — plus `guaranteed_bucket`: true iff the bucket's
      // lower edge is at/above the dedup threshold AND the theoretical
      // S-curve at that edge clears the recall floor. The solve's contract
      // is that EVERY at-or-above-threshold bucket is guaranteed; the
      // oracle value-checks the flag and LshCalibrationSpec asserts it.
      val CalThreshold = 0.7
      val CalFloor = 0.9
      val CalBudget = 64
      val (calNh, calNb) = DedupOps.bandsForThreshold(CalThreshold, CalFloor, CalBudget)
      val calR = calNh / calNb
      val calBucketEdge = math.ceil(CalThreshold * 10).toInt
      QuerySpec(
        "q_text_lsh_calibrated",
        (s, dir) => {
          val docs = t(s, dir, "documents")
          val pairs = DedupOps.ngramJaccardPairs(docs, blockCol = "source")
          val bands = DedupOps.minHashBandsPortable(
            docs, numHashes = calNh, bands = calNb)
          val cands = bands.as("a").join(bands.as("b"),
              col("a.band_id") === col("b.band_id") &&
                col("a.band_sig") === col("b.band_sig") &&
                col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
            .distinct()
            .withColumn("hit", lit(1L))
          // 1-(1-j^r)^b via explicit square-and-multiply chains so the
          // float operation ORDER is written identically in the SQL twin
          // (r = 4, b = 9 at the solved shape)
          def sCurve(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
            val j2 = j * j
            val y = lit(1.0) - j2 * j2
            val y2 = y * y
            val y4 = y2 * y2
            lit(1.0) - y4 * y4 * y
          }
          val expected10k = round(sCurve(col("jaccard")) * 10000.0).cast("long")
          pairs
            .withColumn("j_bucket", floor(col("jaccard") * 10).cast("int"))
            .withColumn("e10k", expected10k)
            .join(cands, Seq("doc_a", "doc_b"), "left")
            .groupBy("j_bucket")
            .agg(
              count(lit(1)).as("n_pairs"),
              sum(coalesce(col("hit"), lit(0L))).as("n_surfaced"),
              round(sum(coalesce(col("hit"), lit(0L))).cast("double")
                / count(lit(1)), 4).as("recall"),
              round(sum(col("e10k")).cast("double")
                / (count(lit(1)) * 10000.0), 4).as("expected_recall"))
            .withColumn("guaranteed_bucket",
              col("j_bucket") >= calBucketEdge &&
                sCurve(col("j_bucket").cast("double") / 10.0) >= CalFloor)
            .orderBy("j_bucket")
        },
        Some {
          val mins = (0 until calNh)
            .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
            .mkString(", ")
          def foldSql(j: Int): String =
            (1 until calR).foldLeft(s"h${j * calR}") { (acc, i) =>
              s"(($acc*31 + h${j * calR + i}) % 1000000007)"
            }
          val bandRows = (0 until calNb)
            .map(j => s"SELECT doc_id, $j AS band_id, ${foldSql(j)} AS band_sig FROM s")
            .mkString("\n             |  UNION ALL ")
          // same square-and-multiply association as the Spark side:
          // y = 1 - (j*j)*(j*j); y9 = ((y*y)*(y*y)) * ((y*y)*(y*y)) * y
          def sCurveSql(j: String): String = {
            val y = s"(1 - (($j*$j)*($j*$j)))"
            s"(1 - ((($y*$y)*($y*$y)) * (($y*$y)*($y*$y)) * $y))"
          }
          s"""WITH toks AS (
             |  SELECT source, doc_id,
             |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), g AS (
             |  SELECT source, doc_id,
             |         list_distinct(list_transform(
             |           range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
             |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS grams
             |  FROM toks
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
             |), pj AS (
             |  SELECT doc_a, doc_b, round(CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE), 4) AS jaccard
             |  FROM p WHERE nc >= 1
             |), eg AS (
             |  SELECT doc_id, unnest(grams) AS gram FROM g
             |), h AS (
             |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
             |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
             |    (a, b) -> (a*31 + b) % 1000000007) AS g64
             |  FROM eg
             |), s AS (
             |  SELECT doc_id, $mins FROM h GROUP BY doc_id
             |), bands AS (
             |  $bandRows
             |), cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM bands a JOIN bands b
             |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
             |   AND a.doc_id < b.doc_id
             |)
             |SELECT j_bucket, n_pairs, n_surfaced, recall, expected_recall,
             |       (j_bucket >= $calBucketEdge
             |        AND ${sCurveSql(s"(CAST(j_bucket AS DOUBLE) / 10.0)")} >= $CalFloor)
             |         AS guaranteed_bucket
             |FROM (
             |  SELECT CAST(floor(jaccard * 10) AS INT) AS j_bucket,
             |         count(*) AS n_pairs,
             |         CAST(sum(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_surfaced,
             |         round(CAST(sum(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             |               / count(*), 4) AS recall,
             |         round(CAST(sum(CAST(round(${sCurveSql("jaccard")} * 10000) AS BIGINT)) AS DOUBLE)
             |               / (count(*) * 10000.0), 4) AS expected_recall
             |  FROM pj LEFT JOIN cand c USING (doc_a, doc_b)
             |  GROUP BY 1
             |) ORDER BY j_bucket""".stripMargin
        }
      )
    },

    QuerySpec(
      "q_text_simhash_portable",
      (s, dir) =>
        DedupOps.simHashPortableDf(t(s, dir, "documents"))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id"),
      Some {
        val votes = (0 until 30)
          .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
          .mkString(",\n         ")
        val pack = (0 until 30)
          .map(i => s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH tk AS (
           |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS tok
           |  FROM documents
           |), h AS (
           |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
           |    list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT)),
           |    (a, b) -> (a*31 + b) % 1000000007) AS h
           |  FROM tk
           |), v AS (
           |  SELECT doc_id,
           |         $votes
           |  FROM h GROUP BY doc_id
           |)
           |SELECT doc_id, CAST($pack AS BIGINT) AS simhash
           |FROM v ORDER BY doc_id""".stripMargin
      }
    ),

    QuerySpec(
      "q_text_curation_pipeline",
      // the WHOLE curation pipeline as one oracle-checked query:
      // quality gate → PII redaction → cross-corpus line dedup →
      // source-blocked near-dup dedup → deterministic 80% downsample.
      // DuckDB recomputes every stage in sequence; a semantic drift in
      // ANY stage (or in how they compose — e.g. line dedup counting
      // doc-frequency over the pre-gate corpus instead of the gated
      // one) breaks the hash match. Redaction is an identity on this
      // corpus (no PII in the synthetic documents, which lets the
      // oracle reuse the token lists); if the testdata ever gains PII
      // the mismatch would surface here rather than pass silently.
      (s, dir) =>
        graft.ops.Curation.curateCorpus(
          t(s, dir, "documents"),
          nearDupThreshold = 0.5,
          sampleRate = 0.8,
          nearDupBlockCol = Some("source"))
          .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE tk0 AS (
             |  SELECT doc_id, source,
             |         list_filter(string_split(text,' '), t -> length(t)>0) AS tk
             |  FROM documents
             |), sig AS (
             |  SELECT doc_id, source, tk,
             |    list_transform(range(1, CASE WHEN length(tk)-1 >= 1 THEN length(tk) ELSE 1 END),
             |                   i -> tk[i] || ' ' || tk[i+1]) AS g2
             |  FROM tk0
             |), gated AS (
             |  SELECT doc_id, source, tk FROM sig
             |  WHERE CAST(length(tk) AS BIGINT) >= 20
             |    AND round(CAST(length(list_distinct(tk)) AS DOUBLE)
             |              / CAST(length(tk) AS DOUBLE), 4) >= 0.35
             |    AND round(CASE WHEN length(tk) > 0 THEN
             |      CAST(list_max(list_transform(list_distinct(tk),
             |             x -> length(list_filter(tk, y -> y = x)))) AS DOUBLE)
             |        / CAST(length(tk) AS DOUBLE) ELSE 0.0 END, 4) <= 0.12
             |    AND round(CASE WHEN length(g2) > 0 THEN
             |      CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE)
             |        / CAST(length(g2) AS DOUBLE) ELSE 0.0 END, 4) <= 0.06
             |), toks AS (
             |  SELECT doc_id, source, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord
             |  FROM gated
             |), lines AS (
             |  SELECT doc_id, source, CAST((ord-1)//8 AS BIGINT) AS line_no,
             |         string_agg(tok, ' ' ORDER BY ord) AS line
             |  FROM toks GROUP BY 1, 2, 3
             |), dfreq AS (
             |  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) <= 1
             |), clean AS (
             |  SELECT l.doc_id, l.source, string_agg(l.line, ' ' ORDER BY l.line_no) AS text
             |  FROM lines l JOIN dfreq USING (line) GROUP BY 1, 2
             |), ctk AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      range(1, CASE WHEN length(tk2) - 2 >= 1 THEN length(tk2) - 1 ELSE 1 END),
             |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2])) AS grams
             |  FROM (SELECT doc_id, source,
             |               list_filter(string_split(text,' '), t -> length(t)>0) AS tk2
             |        FROM clean)
             |  WHERE length(grams) > 0
             |), p AS (
             |  SELECT a.doc_id AS da, b.doc_id AS db,
             |         length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nc,
             |         length(a.grams) + length(b.grams)
             |         - length(list_filter(a.grams, x -> list_contains(b.grams, x))) AS nu
             |  FROM ctk a JOIN ctk b ON a.source = b.source AND a.doc_id < b.doc_id
             |), e AS (
             |  SELECT da, db FROM p WHERE nc >= 1 AND round(CAST(nc AS DOUBLE) / nu, 4) >= 0.5
             |), und AS (
             |  SELECT da AS a, db AS b FROM e
             |  UNION ALL
             |  SELECT db, da FROM e
             |), reach(node, lab) AS (
             |  SELECT a, a FROM und
             |  UNION
             |  SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
             |), losers AS (
             |  SELECT node FROM reach GROUP BY node HAVING node <> min(lab)
             |)
             |SELECT doc_id, text FROM clean
             |WHERE doc_id NOT IN (SELECT node FROM losers)
             |  AND ${graft.ops.Curation.uniformGateSql("doc_id::VARCHAR")} < 0.8
             |ORDER BY doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_quality_filter",
      // the composite Gopher-style GATE over the per-doc signals: both
      // engines recompute length/diversity/repetition and must agree on
      // every keep/drop decision (thresholds compare rounded signals,
      // so boundary docs cannot land on different sides)
      (s, dir) =>
        TextAnalysis.gopherFilter(t(s, dir, "documents"))
          .select(col("doc_id"), col("n_tokens"), col("type_token_ratio"),
            col("top_token_frac"), col("dup_2gram_frac"))
          .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(string_split(text,' '), t -> length(t)>0) AS tk
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, tk,
             |    list_transform(range(1, CASE WHEN length(tk)-1 >= 1 THEN length(tk) ELSE 1 END),
             |                   i -> tk[i] || ' ' || tk[i+1]) AS g2
             |  FROM tk
             |), m AS (
             |  SELECT doc_id,
             |    CAST(length(tk) AS BIGINT) AS n_tokens,
             |    round(CAST(length(list_distinct(tk)) AS DOUBLE)
             |          / CAST(length(tk) AS DOUBLE), 4) AS type_token_ratio,
             |    round(CASE WHEN length(tk) > 0 THEN
             |      CAST(list_max(list_transform(list_distinct(tk),
             |             x -> length(list_filter(tk, y -> y = x)))) AS DOUBLE)
             |        / CAST(length(tk) AS DOUBLE) ELSE 0.0 END, 4) AS top_token_frac,
             |    round(CASE WHEN length(g2) > 0 THEN
             |      CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE)
             |        / CAST(length(g2) AS DOUBLE) ELSE 0.0 END, 4) AS dup_2gram_frac
             |  FROM g
             |)
             |SELECT doc_id, n_tokens, type_token_ratio, top_token_frac, dup_2gram_frac
             |FROM m
             |WHERE n_tokens >= 20 AND type_token_ratio >= 0.35
             |  AND top_token_frac <= 0.12 AND dup_2gram_frac <= 0.06
             |ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_line_dedup",
      // C4/CCNet-style cross-corpus duplicated-line removal: segment
      // each doc into 8-token lines, drop every line present in more
      // than one document (boilerplate), reassemble the survivors.
      // Value-checked line-for-line against DuckDB recomputing the
      // same segmentation + doc-frequency filter.
      (s, dir) =>
        DedupOps.dedupLinesTokenized(
          t(s, dir, "documents"), tokensPerLine = 8, maxDocFreq = 1)
          .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS tok,
             |         generate_subscripts(list_filter(string_split(text,' '), x -> length(x)>0), 1) AS ord
             |  FROM documents
             |), lines AS (
             |  SELECT doc_id, CAST((ord-1)//8 AS BIGINT) AS line_no,
             |         string_agg(tok, ' ' ORDER BY ord) AS line
             |  FROM toks GROUP BY 1, 2
             |), dfreq AS (
             |  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) <= 1
             |)
             |SELECT l.doc_id, string_agg(l.line, ' ' ORDER BY l.line_no) AS text_clean
             |FROM lines l JOIN dfreq d USING (line)
             |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin),
      bench = true
    ),

    QuerySpec(
      "q_text_cdc_chunk",
      // content-defined chunking: boundaries where the 3-gram ending at
      // a token hashes ≡ 0 (mod 8) — edit-stable chunk borders (the
      // chunking that keeps chunk dedup / embedding caches valid across
      // document revisions). polyHash grams replay exactly in DuckDB,
      // so chunk borders AND contents are value-checked.
      (s, dir) =>
        graft.ops.Chunking.contentDefinedChunks(
          t(s, dir, "documents"), "doc_id", "text", k = 3, modulus = 8)
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(string_split(text,' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), pos AS (
             |  SELECT doc_id, tk, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord FROM tk
             |), fl AS (
             |  SELECT doc_id, ord, tok,
             |    CASE WHEN ord >= 3 AND
             |      list_reduce(list_prepend(0::BIGINT,
             |        list_transform(string_split(
             |          array_to_string(list_slice(tk, ord - 2, ord), ' '), ''),
             |          c -> ascii(c)::BIGINT)),
             |        (a, b) -> (a*31 + b) % 1000000007) % 8 = 0
             |    THEN 1 ELSE 0 END AS b
             |  FROM pos
             |), ch AS (
             |  SELECT doc_id, ord, tok,
             |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY ord
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
             |  FROM fl
             |)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |       string_agg(tok, ' ' ORDER BY ord) AS text,
             |       count(*) AS n_tokens
             |FROM ch GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_cdc_chunk_dedup",
      // the composition content-defined chunking exists for: repeated
      // passages chunk identically in every doc that carries them, so
      // one keep-first pass over chunk text removes cross-document
      // repetition — no pairwise join, no position sensitivity
      (s, dir) =>
        DedupOps.dedupContentChunks(
          t(s, dir, "documents"), "doc_id", "text", k = 3, modulus = 8)
          .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(string_split(text,' '), t -> length(t) > 0) AS tk
             |  FROM documents
             |), pos AS (
             |  SELECT doc_id, tk, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord FROM tk
             |), fl AS (
             |  SELECT doc_id, ord, tok,
             |    CASE WHEN ord >= 3 AND
             |      list_reduce(list_prepend(0::BIGINT,
             |        list_transform(string_split(
             |          array_to_string(list_slice(tk, ord - 2, ord), ' '), ''),
             |          c -> ascii(c)::BIGINT)),
             |        (a, b) -> (a*31 + b) % 1000000007) % 8 = 0
             |    THEN 1 ELSE 0 END AS b
             |  FROM pos
             |), ch AS (
             |  SELECT doc_id, ord, tok,
             |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY ord
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
             |  FROM fl
             |), chunks AS (
             |  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY ord) AS text
             |  FROM ch GROUP BY 1, 2
             |), kept AS (
             |  SELECT doc_id, chunk_id, text FROM (
             |    SELECT doc_id, chunk_id, text,
             |      row_number() OVER (PARTITION BY text ORDER BY doc_id, chunk_id) AS rn
             |    FROM chunks) WHERE rn = 1
             |)
             |SELECT doc_id, string_agg(text, ' ' ORDER BY chunk_id) AS text_clean,
             |       count(*) AS n_chunks
             |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_intradoc_dedup",
      // RefinedWeb-style INTRA-document repetition removal: within one
      // doc keep only the first occurrence of each repeated 4-token
      // line (cross-corpus line dedup can't see these — its doc
      // frequency counts distinct docs). 4-token lines, not 8, so the
      // synthetic corpus actually exhibits intra-doc repeats.
      (s, dir) =>
        DedupOps.removeIntraDocRepetition(
          t(s, dir, "documents"), tokensPerLine = 4)
          .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS tok,
             |         generate_subscripts(list_filter(string_split(text,' '), x -> length(x)>0), 1) AS ord
             |  FROM documents
             |), lines AS (
             |  SELECT doc_id, CAST((ord-1)//4 AS BIGINT) AS line_no,
             |         string_agg(tok, ' ' ORDER BY ord) AS line
             |  FROM toks GROUP BY 1, 2
             |), firsts AS (
             |  SELECT doc_id, line, min(line_no) AS line_no
             |  FROM lines GROUP BY 1, 2
             |)
             |SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text_clean
             |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_pii",
      // PII scrub: inject a deterministic email / IPv4 / phone tail per
      // doc (the corpus carries none), redact, and value-check the
      // redacted strings — both engines run the identical RE2-subset
      // patterns, so the outputs must be byte-equal.
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(
              col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com from 10.0."), col("doc_id") % 256,
              lit(".7 call +1-555-"), col("doc_id") + 1000).as("text_pii"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.redactPii(col("text_pii")).as("text_redacted"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        text || ' contact user' || doc_id || '@example.com from 10.0.'
             |             || (doc_id % 256) || '.7 call +1-555-' || (doc_id + 1000),
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |    '\+\d{1,3}-\d{3}-\d{3,6}', '<PHONE>', 'g') AS text_redacted
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    QuerySpec(
      "q_text_dedup_incremental",
      incrementalDedupFlow,
      Some(incrementalDedupOracle),
      bench = true
    ),

    QuerySpec(
      "q_text_dedup_stream",
      streamDedupFlow,
      Some(streamDedupOracle)
    ),

    QuerySpec(
      "q_text_curation_stream",
      streamCurationFlow,
      Some(streamCurationOracle)
    )
  )

  /** Incremental LSH-index dedup flow ([[graft.stream.DedupIndex]]): the
    * documents table arrives as three batches (tertiles by doc id — the
    * ntile window is the TEST's arrival simulator, not part of the
    * operator; a real pipeline feeds real micro-batches). Each step
    * probes a persistent lakehouse band index with one equality join,
    * accepts first-seen docs, and appends its signatures exactly-once.
    * Batch 3 is then crash-REPLAYED: it must return the same survivor
    * set and grow the index by nothing (`replay_ok` pins both).
    *
    * The oracle recomputes survivors GLOBALLY — one DuckDB NOT EXISTS
    * over the full corpus's portable-minhash bands ordered by doc id —
    * so a hash match proves the incremental, index-backed computation
    * equals the one-shot batch dedup exactly (the property that lets a
    * 100 TB pipeline dedup per-arrival instead of re-running all-pairs).
    */
  private def incrementalDedupFlow(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.Path
    val docs = t(s, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    // both diamonds persisted (tiny: 3-column corpus slice; survivor id
    // lists): `batched` is referenced by four band computations and each
    // step's survivor frame is read twice (replay comparison + final
    // union) — unpersisted, the probe joins and the global-ntile arrival
    // simulator replay per reference. Session sweep (Bench) reclaims.
    val batched = docs
      .select(col("doc_id"), col("text"))
      .withColumn("batch", ntile(3).over(w).cast(LongType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // signatures for the WHOLE corpus in one wave: the shingle→minhash
    // pass is history-independent, so computing it per step would just
    // split one parallel job into three sequential ones — only the
    // probe/commit sequencing below is inherently ordered
    val allBands = DedupOps.minHashBandsPortable(batched)
      .join(batched.select(col("doc_id"), col("batch")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = graft.stream.DedupIndex.createIndex(
      s, new Path(LakeOps.freshWarehouse("graft-di"), "dedup_index"))
    // the exactly-once commits are the ONLY inherently sequential part;
    // every batch's survivors then derive from ONE persisted read of the
    // final index (batch_id stamps make the history filters
    // time-invariant — DedupIndex.commitBatch scaladoc), replacing
    // three per-step file reads with a shared cached scan
    (1L to 3L).foreach(b => graft.stream.DedupIndex.commitBatch(
      index, allBands.filter(col("batch") === b).drop("batch"), "dedup", b))
    val committed = index.read()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ALL batches' survivors in one window+aggregate pass over the
    // committed read (r19): the sequential backfill above satisfies
    // survivorsBackfill's settled-disjoint preconditions, so one shared
    // derivation replaces three per-batch probe pipelines (each several
    // joins/distincts/broadcast builds — measured ~1.1 s apiece at
    // sf0.1). Spec-asserted equal to the per-batch probes; the replay
    // below still exercises the full step (commit + probe) path.
    val allSurvivors = graft.stream.DedupIndex.survivorsBackfill(committed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // plain filter views of the one cached derivation — no per-batch
    // persists needed anymore (each was a full probe pipeline before)
    val perBatch = (1L to 3L).map(b => allSurvivors.filter(col("batch") === b))
    // index growth is tracked in snapshot metadata — zero-job reads
    def indexRows: Long =
      index.metadata.currentSnapshot.map(_.totalRows).getOrElse(0L)
    val rowsBefore = indexRows
    // the replay goes through the FULL step path (commit + probe), so
    // the watermark no-op and the read-back probe stay exercised
    val replayed = graft.stream.DedupIndex.step(
      index,
      allBands.filter(col("batch") === 3L).drop("batch"),
      "dedup", 3L, settledBefore = Some(2L))
    // the replay comparison rides the SAME job as the output (scalar
    // aggregates cross-joined onto the union) instead of two extra
    // sequential count() jobs ahead of it; the index-growth half of the
    // invariant is metadata, checked eagerly above
    val indexOk = indexRows == rowsBefore
    val replayCheck = replayed.agg(count(lit(1)).as("__replay_n")).crossJoin(
      perBatch.last.agg(count(lit(1)).as("__orig_n")))
    perBatch.reduce(_ unionByName _)
      .crossJoin(broadcast(replayCheck))
      .withColumn("replay_ok",
        col("__replay_n") === col("__orig_n") && lit(indexOk))
      .drop("__replay_n", "__orig_n")
      .orderBy("doc_id")
  }

  /** LIVE continuous-dedup race ([[graft.stream.DedupStream]]): a real
    * poller thread dedups the documents table as it streams raw→clean
    * through a persistent band index, while three in-doc-id-order
    * appends land against it. Micro-batch boundaries are whatever the
    * race produces — the oracle can still value-check the result
    * because first-seen-wins over (batch, doc id) is INVARIANT to
    * contiguous batching when arrival follows doc-id order: any merge
    * of adjacent batches preserves the global doc-id order, so the
    * survivor set equals the one global NOT EXISTS DuckDB computes.
    * `caught_up` pins that the stream actually drained.
    */
  private def streamDedupFlow(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.Path
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val batched = docs.withColumn("batch", ntile(3).over(w).cast(LongType))
    val wh = LakeOps.freshWarehouse("graft-ds")
    val src = graft.lake.LakehouseTable.createIfNotExists(
      s, new Path(wh, "raw"), docs.schema, None)
    val dst = graft.lake.LakehouseTable.createIfNotExists(
      s, new Path(wh, "clean"), docs.schema, None)
    val index = graft.stream.DedupIndex.createIndex(s, new Path(wh, "index"))
    val q = graft.stream.DedupStream.start(
      src, dst, index, "clean", DedupOps.minHashBandsPortable(_), pollIntervalMs = 20L)
    val caughtUp =
      try {
        (1L to 3L).foreach { b =>
          src.append(batched.filter(col("batch") === b).drop("batch"))
          Thread.sleep(30L)
        }
        q.awaitCaughtUp(120000L)
      } finally q.stop()
    dst.read().select("doc_id")
      .withColumn("caught_up", lit(caughtUp))
      .orderBy("doc_id")
  }

  private def streamDedupOracle: String = {
    val mins = (0 until 8)
      .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
      .mkString(",\n         ")
    val bandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, ${j}::BIGINT AS band_id, " +
        s"(h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band_sig FROM s")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
       |  FROM toks
       |), h AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
       |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
       |    (a, b) -> (a*31 + b) % 1000000007) AS g64
       |  FROM g
       |), s AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM h GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), surv AS (
       |  SELECT d.doc_id FROM documents d
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM bands a JOIN bands m
       |      ON a.band_id = m.band_id AND a.band_sig = m.band_sig
       |     AND a.doc_id < m.doc_id
       |    WHERE m.doc_id = d.doc_id)
       |)
       |SELECT doc_id, TRUE AS caught_up
       |FROM surv ORDER BY doc_id""".stripMargin
  }

  /** LIVE continuous-curation race ([[graft.stream.CurationStream]]):
    * gate → redact → index-dedup riding the raw→clean stream while
    * three in-order appends land. The oracle recomputes the whole
    * composition globally in DuckDB — gate signals on RAW text, dedup
    * signatures on REDACTED text, survivors via one NOT EXISTS — so a
    * drift in any stage OR in their composition breaks the hash. Same
    * batching-invariance argument as `q_text_dedup_stream`.
    */
  private def streamCurationFlow(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.Path
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val batched = docs.withColumn("batch", ntile(3).over(w).cast(LongType))
    val wh = LakeOps.freshWarehouse("graft-cs")
    val src = graft.lake.LakehouseTable.createIfNotExists(
      s, new Path(wh, "raw"), docs.schema, None)
    val dst = graft.lake.LakehouseTable.createIfNotExists(
      s, new Path(wh, "clean"), docs.schema, None)
    val index = graft.stream.DedupIndex.createIndex(s, new Path(wh, "index"))
    val q = graft.stream.CurationStream.start(
      src, dst, index, "curate",
      bandsOf = Some(DedupOps.minHashBandsPortable(_)), pollIntervalMs = 20L)
    val caughtUp =
      try {
        (1L to 3L).foreach { b =>
          src.append(batched.filter(col("batch") === b).drop("batch"))
          Thread.sleep(30L)
        }
        q.awaitCaughtUp(120000L)
      } finally q.stop()
    dst.read().select(col("doc_id"), col("text").as("text_clean"))
      .withColumn("caught_up", lit(caughtUp))
      .orderBy("doc_id")
  }

  private def streamCurationOracle: String = {
    val mins = (0 until 8)
      .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
      .mkString(",\n         ")
    val bandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, ${j}::BIGINT AS band_id, " +
        s"(h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band_sig FROM s")
      .mkString("\n  UNION ALL ")
    s"""WITH tk0 AS (
       |  SELECT doc_id, list_filter(string_split(text,' '), t -> length(t)>0) AS tk
       |  FROM documents
       |), sig AS (
       |  SELECT doc_id, tk,
       |    list_transform(range(1, CASE WHEN length(tk)-1 >= 1 THEN length(tk) ELSE 1 END),
       |                   i -> tk[i] || ' ' || tk[i+1]) AS g2
       |  FROM tk0
       |), keep AS (
       |  SELECT doc_id FROM sig
       |  WHERE CAST(length(tk) AS BIGINT) >= 20
       |    AND round(CAST(length(list_distinct(tk)) AS DOUBLE)
       |              / CAST(length(tk) AS DOUBLE), 4) >= 0.35
       |    AND round(CASE WHEN length(tk) > 0 THEN
       |      CAST(list_max(list_transform(list_distinct(tk),
       |             x -> length(list_filter(tk, y -> y = x)))) AS DOUBLE)
       |        / CAST(length(tk) AS DOUBLE) ELSE 0.0 END, 4) <= 0.12
       |    AND round(CASE WHEN length(g2) > 0 THEN
       |      CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE)
       |        / CAST(length(g2) AS DOUBLE) ELSE 0.0 END, 4) <= 0.06
       |), red AS (
       |  SELECT d.doc_id,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(d.text,
       |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
       |      '\\+\\d{1,3}-\\d{3}-\\d{3,6}', '<PHONE>', 'g') AS text
       |  FROM documents d JOIN keep USING (doc_id)
       |), toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
       |  FROM red
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
       |  FROM toks
       |), h AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
       |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
       |    (a, b) -> (a*31 + b) % 1000000007) AS g64
       |  FROM g
       |), s AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM h GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), surv AS (
       |  SELECT r.doc_id FROM red r
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM bands a JOIN bands m
       |      ON a.band_id = m.band_id AND a.band_sig = m.band_sig
       |     AND a.doc_id < m.doc_id
       |    WHERE m.doc_id = r.doc_id)
       |)
       |SELECT surv.doc_id, red.text AS text_clean, TRUE AS caught_up
       |FROM surv JOIN red USING (doc_id) ORDER BY surv.doc_id""".stripMargin
  }

  private def incrementalDedupOracle: String = {
    val mins = (0 until 8)
      .map(i => s"min((${2 * i + 3}::BIGINT*g64 + ${5 * i + 7}) % 1000000007) AS h$i")
      .mkString(",\n         ")
    val bandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, ${j}::BIGINT AS band_id, " +
        s"(h${2 * j}*31 + h${2 * j + 1}) % 1000000007 AS band_sig FROM s")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, CASE WHEN length(tk) - 2 >= 1 THEN length(tk) - 1 ELSE 1 END),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
       |  FROM toks
       |), h AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
       |    list_transform(string_split(gram, ''), c -> ascii(c)::BIGINT)),
       |    (a, b) -> (a*31 + b) % 1000000007) AS g64
       |  FROM g
       |), s AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM h GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), nt AS (
       |  SELECT doc_id, CAST(ntile(3) OVER (ORDER BY doc_id) AS BIGINT) AS batch
       |  FROM documents
       |), surv AS (
       |  SELECT DISTINCT b.doc_id FROM bands b
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM bands a JOIN bands m
       |      ON a.band_id = m.band_id AND a.band_sig = m.band_sig
       |     AND a.doc_id < m.doc_id
       |    WHERE m.doc_id = b.doc_id)
       |)
       |SELECT surv.doc_id, nt.batch, TRUE AS replay_ok
       |FROM surv JOIN nt USING (doc_id) ORDER BY surv.doc_id""".stripMargin
  }
}
