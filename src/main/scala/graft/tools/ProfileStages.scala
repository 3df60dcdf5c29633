package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level wall-clock decomposition of the heavy bench queries —
  * the "measure first" tool of the optimization rounds (guide §1).
  * Each labelled stage materializes through the noop sink; persisted
  * diamonds mirror the real pipeline wiring so incremental stage costs
  * are attributable. NOT part of the bench contract; local diagnosis
  * only.
  */
object ProfileStages {
  private def sweep(spark: SparkSession): Unit =
    graft.util.QuietLogs.quietly(graft.util.QuietLogs.SparkRddPackage) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-42s $s%8.3f s")
      s
    }

    val which = if (args.nonEmpty) args.toSet else Set("curation")

    import graft.Tables.t
    import graft.ops._

    if (which("curation")) {
      val docs = t(spark, sfDir, "documents")
      // warmup scan
      time("scan documents (noop)")(docs)
      time("tokens projection") {
        docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      }
      time("gopherFilter")(TextAnalysis.gopherFilter(docs, "text"))
      time("gopher+redact") {
        TextAnalysis.gopherFilter(docs, "text")
          .select(docs.columns.map(col).toIndexedSeq: _*)
          .withColumn("text", TextAnalysis.redactPii(col("text")))
      }
      sweep(spark)

      // stage-wise curation full, mirroring Curation.curateCorpusFull
      val gated = TextAnalysis.gopherFilter(docs, "text")
        .select(docs.columns.map(col).toIndexedSeq: _*)
      val redacted = gated
        .withColumn("text", TextAnalysis.redactPii(col("text")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("redacted (persist fill)")(redacted)
      time("segmentTokenLines(redacted)") {
        DedupOps.segmentTokenLines(redacted, "doc_id", "text", 8)
      }
      time("dedupLinesTokenized(redacted)") {
        DedupOps.dedupLinesTokenized(redacted, "doc_id", "text", 8, 1)
      }
      val lineDeduped = DedupOps
        .dedupLinesTokenized(redacted, "doc_id", "text", 8, 1)
        .withColumnRenamed("text_clean", "text")
      val joined = lineDeduped.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      val base = joined.persist(StorageLevel.MEMORY_AND_DISK)
      time("base (line-deduped+block, persist fill)")(base)
      time("ngramJaccardPairs(base)") {
        DedupOps.ngramJaccardPairs(base, "source", "doc_id", "text", 3, 1000)
      }
      val pairs = DedupOps.ngramJaccardPairs(base, "source", "doc_id", "text", 3, 1000)
        .filter(col("jaccard") >= 0.5)
      time("dedupByPairs(base, pairs) [incl CC]") {
        DedupOps.dedupByPairs(base, pairs, "doc_id")
      }
      val v1 = DedupOps.dedupByPairs(base, pairs, "doc_id")
        .select(col("doc_id"), col("text"))
      time("maskDuplicatedSpans(v1)") {
        DedupOps.maskDuplicatedSpans(v1, "doc_id", "text", 8, 2)
      }
      val spanned = DedupOps.maskDuplicatedSpans(v1, "doc_id", "text", 8, 2)
        .select(col("doc_id"), col("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("spanned (persist fill)")(spanned)
      val ref = spanned.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .filter(col("lang") === "en")
      val model = NgramLM.fitBigrams(ref, "text")
      time("LM fit+score+gate") {
        spanned.join(
          NgramLM.scorePerplexity(spanned, model, "doc_id", "text")
            .filter(col("avg_nll") <= 3.55)
            .select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      }
      sweep(spark)
      time("q_text_curation_full end-to-end") {
        graft.queries.Registry.byName("q_text_curation_full").run(spark, sfDir)
      }
      sweep(spark)
    }

    if (which("dsir")) {
      time("q_text_dsir end-to-end") {
        graft.queries.Registry.byName("q_text_dsir").run(spark, sfDir)
      }
      sweep(spark)
      val docs = t(spark, sfDir, "documents")
      val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      val bigrams = when(size(toks) >= 2,
        zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))
      val fb = transform(concat(toks, bigrams),
        g => graft.functions.PolyHash(g) % 4096)
      time("corpus featureBuckets explode+count") {
        docs.select(explode(fb).as("b")).groupBy("b").count()
      }
      sweep(spark)
    }

    if (which("incremental")) {
      time("q_text_dedup_incremental end-to-end") {
        graft.queries.Registry.byName("q_text_dedup_incremental").run(spark, sfDir)
      }
      sweep(spark)
      val docs = t(spark, sfDir, "documents")
      time("minHashBandsPortable(docs)") {
        DedupOps.minHashBandsPortable(docs.select(col("doc_id"), col("text")))
      }
      sweep(spark)
    }

    if (which("jaccard")) {
      val docs = t(spark, sfDir, "documents")
      val keep = Seq(col("source").as("block"), col("doc_id").as("id"))
      val shingledDf = docs
        .select(keep :+ TextAnalysis.tokens(col("text")).as("toks"): _*)
        .select(col("block"), col("id"),
          DedupOps.shinglesFromTokens(col("toks"), 3).as("grams"))
      time("shingled gram strings (projection)")(shingledDf)
      sweep(spark)
      val explodedAll = shingledDf
        .select(col("block"), col("id"), explode_outer(col("grams")).as("gram"))
        .filter(col("gram").isNotNull)
        .select(col("block"), col("id"), xxhash64(col("gram")).as("g64"))
      time("explode + xxhash64 (count)")(explodedAll.groupBy("block").count())
      sweep(spark)
      val dfWin = org.apache.spark.sql.expressions.Window.partitionBy("block", "g64")
      val exploded = explodedAll
        .withColumn("df", count(lit(1)).over(dfWin))
        .filter(col("df") <= 1000)
        .drop("df")
      time("window df-cap (count)")(exploded.groupBy("block").count())
      sweep(spark)
      time("ngramJaccardPairs full") {
        DedupOps.ngramJaccardPairs(docs, "source", "doc_id", "text", 3, 1000)
      }
      sweep(spark)
      time("q_text_ngram_jaccard end-to-end") {
        graft.queries.Registry.byName("q_text_ngram_jaccard").run(spark, sfDir)
      }
      sweep(spark)
    }

    if (which("lines")) {
      val docs = t(spark, sfDir, "documents")
      time("segmentTokenLines (count)") {
        DedupOps.segmentTokenLines(docs, "doc_id", "text", 8).groupBy().count()
      }
      sweep(spark)
      val lines = DedupOps.segmentTokenLines(docs, "doc_id", "text", 8)
      time("dropDuplicatedLines (count)") {
        DedupOps.dropDuplicatedLines(lines, "doc_id", "line", 1).groupBy().count()
      }
      sweep(spark)
      time("dedupLinesTokenized full")(
        DedupOps.dedupLinesTokenized(docs, "doc_id", "text", 8, 1))
      sweep(spark)
      time("q_text_line_dedup end-to-end") {
        graft.queries.Registry.byName("q_text_line_dedup").run(spark, sfDir)
      }
      sweep(spark)
    }

    if (which("clusters")) {
      time("q_text_dedup_clusters end-to-end") {
        graft.queries.Registry.byName("q_text_dedup_clusters").run(spark, sfDir)
      }
      sweep(spark)
    }

    spark.stop()
  }
}
