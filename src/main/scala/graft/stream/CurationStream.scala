package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.LakehouseTable
import graft.ops.{DedupOps, TextAnalysis}

/** CONTINUOUS corpus curation: the streaming twin of
  * [[graft.ops.Curation.curateCorpus]]'s per-document stages, run as a
  * [[TableStream]] pipeline — each micro-batch is quality-GATED
  * ([[TextAnalysis.gopherFilter]], scan-speed projection), PII-REDACTED
  * ([[TextAnalysis.redactPii]], projection), then near-dup-DEDUPED
  * against the persistent [[DedupIndex]] before only the surviving,
  * cleaned rows land in the destination table. Ingest-time curation is
  * the 100 TB shape: a document rejected at arrival costs O(its batch),
  * a nightly re-curation of the accumulated lake costs O(everything).
  *
  * Stage order matters and matches the batch pipeline: the gate sees
  * RAW text (its repetition/diversity signals are corpus-quality
  * measurements; redaction placeholders would distort them), while
  * dedup signatures are computed on REDACTED text (two docs differing
  * only in redacted emails ARE duplicates). The corpus-global stages of
  * the batch pipeline (cross-document line dedup, span masking, LM
  * fit) are deliberately absent here: their statistics are defined over
  * the whole corpus, not a batch — they remain batch maintenance jobs
  * over the accumulated clean table.
  *
  * Exactly-once inherits [[DedupStream]]'s protocol wholesale: index
  * commit then destination commit under the same (consumerId,
  * snapshotId); a crash between the two replays as a merged batch with
  * the crash-sliver excluded from the probe ([[DedupIndex.step]]
  * `settledBefore`). Gate and redaction are deterministic projections,
  * so replaying them is trivially idempotent.
  */
object CurationStream {

  /** The batch-aware transform: gate → redact → index-dedup. Exposed
    * for deterministic single-trigger driving; [[start]] is the
    * managed form.
    */
  def transform(
      index: LakehouseTable,
      dst: LakehouseTable,
      consumerId: String,
      bandsOf: DataFrame => DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Long = 20L): (DataFrame, Long) => DataFrame =
    (delta, batchId) => {
      val gated = TextAnalysis.gopherFilter(delta, textCol, minTokens = minTokens)
        .select(delta.columns.map(col).toIndexedSeq: _*) // drop signal columns
      val redacted = gated.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      val settled = dst.metadata.streamWatermarks.get(consumerId)
      val dropped = DedupIndex
        .stepDropped(index, bandsOf(redacted), consumerId, batchId, settled)
        .withColumnRenamed("doc_id", idCol)
      redacted.join(dropped, Seq(idCol), "left_anti")
    }

  /** Start the managed raw→clean curation poller. `bandsOf` defaults to
    * the production xxhash64 MinHash-LSH banding over the redacted
    * text; pass [[DedupOps.minHashBandsPortable]] for cross-engine-
    * verifiable signatures (`q_text_curation_stream` does).
    */
  def start(
      src: LakehouseTable,
      dst: LakehouseTable,
      index: LakehouseTable,
      consumerId: String,
      bandsOf: Option[DataFrame => DataFrame] = None,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Long = 20L,
      pollIntervalMs: Long = 200L,
      maxSnapshotsPerBatch: Int = Int.MaxValue): TableStreamQuery = {
    val bands = bandsOf.getOrElse { (d: DataFrame) =>
      DedupOps.lshBands(DedupOps.minHashSignatures(d, idCol, textCol))
        .withColumnRenamed("id", "doc_id")
    }
    TableStream.startBatchAware(
      src, dst, consumerId,
      transform(index, dst, consumerId, bands, idCol, textCol, minTokens),
      pollIntervalMs, maxSnapshotsPerBatch)
  }
}
