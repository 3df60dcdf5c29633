package graft.stream

import org.apache.spark.sql.DataFrame

import graft.lake.LakehouseTable

/** CONTINUOUS corpus dedup: a [[TableStream]] pipeline that polls a raw
  * document table and delivers only first-seen documents to a clean
  * table, deduping each micro-batch against a persistent
  * [[DedupIndex]] — the always-on form of `q_text_dedup_incremental`,
  * and the shape a 100 TB ingest actually runs: dedup rides the ingest
  * stream, it is not a nightly all-pairs job.
  *
  * Exactly-once across THREE tables with no two-phase protocol: each
  * trigger (1) commits the batch's band signatures to the index under
  * (consumerId, snapshotId) via [[LakehouseTable.appendStream]], then
  * (2) commits the surviving rows to the destination under the SAME
  * (consumerId, snapshotId), which also advances the resume offset.
  * A crash between (1) and (2) leaves the index one batch ahead; the
  * retried trigger — possibly spanning a LARGER delta if the source
  * kept moving — replays safely because [[DedupIndex.step]]'s history
  * probe is stamp-bounded and self-excluding: the half-committed
  * batch's own signatures can neither double-append (watermark) nor
  * poison their own documents (same-doc guard). Either both commits
  * eventually land for a boundary, or neither did and the boundary is
  * re-derived — no state diverges.
  *
  * Survivor semantics under merged/replayed boundaries: first-seen-wins
  * ordered by (batch, doc id). When the source is appended in doc-id
  * order (or doc ids are assigned at ingest, the common case), the
  * survivor set is INVARIANT to where micro-batch boundaries fall —
  * `q_text_dedup_stream` exploits exactly that to oracle-check a live
  * race whose batching is nondeterministic.
  */
object DedupStream {

  /** The batch-aware transform: index-probe + survivors semi-join.
    * Exposed for deterministic single-trigger driving in tests;
    * [[start]] is the managed form.
    */
  def transform(
      index: LakehouseTable,
      dst: LakehouseTable,
      consumerId: String,
      bandsOf: DataFrame => DataFrame,
      idCol: String = "doc_id"): (DataFrame, Long) => DataFrame =
    (delta, batchId) => {
      // the destination's committed watermark bounds the crash-sliver
      // exclusion inside the probe (see DedupIndex.step settledBefore)
      val settled = dst.metadata.streamWatermarks.get(consumerId)
      // anti-join on the REJECTED set (not semi-join on survivors): a
      // doc too short to produce any signature has nothing to match —
      // it must pass through, not silently vanish
      val dropped = DedupIndex
        .stepDropped(index, bandsOf(delta), consumerId, batchId, settled)
        .withColumnRenamed("doc_id", idCol)
      delta.join(dropped, Seq(idCol), "left_anti")
    }

  /** Start the managed poller mirroring first-seen docs of `src` into
    * `dst`. `bandsOf` derives (doc_id, band_id, band_sig) signature
    * rows from a delta — e.g. portable-minhash banding, or an
    * exact-text single band for exact dedup. The returned handle is a
    * plain [[TableStreamQuery]] (stop/awaitCaughtUp/lastError).
    */
  def start(
      src: LakehouseTable,
      dst: LakehouseTable,
      index: LakehouseTable,
      consumerId: String,
      bandsOf: DataFrame => DataFrame,
      idCol: String = "doc_id",
      pollIntervalMs: Long = 200L,
      maxSnapshotsPerBatch: Int = Int.MaxValue): TableStreamQuery =
    TableStream.startBatchAware(
      src, dst, consumerId, transform(index, dst, consumerId, bandsOf, idCol),
      pollIntervalMs, maxSnapshotsPerBatch)
}
