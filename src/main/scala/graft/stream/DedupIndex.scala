package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakehouseTable

/** Incremental corpus dedup against a PERSISTENT LSH band index.
  *
  * The batch dedup operators ([[graft.ops.DedupOps.dedupCorpus]],
  * `dedupCorpusLsh`) answer "dedup THIS corpus" with a self-join over the
  * whole corpus — the right shape for a one-shot clean, the wrong one for
  * continuous ingest: re-running all-pairs over corpus ∪ batch on every
  * arrival is O(total²) work for O(batch) new data. The shape a 100 TB
  * ingest pipeline actually runs is an INDEX: band signatures of everything
  * seen so far persisted in a lakehouse table, each new batch probing it
  * with one equality join and appending its own signatures exactly-once.
  * (The reference has no streaming dedup at all — its per-run anti-join on
  * event ids, `lakehouse_pipeline.py:245-253`, is the exact-key analog of
  * what this generalizes to near-duplicates.)
  *
  * Semantics — ONLINE FIRST-SEEN-WINS, order-free within a batch:
  * a document is accepted iff no strictly-earlier document (earlier batch,
  * or same batch with a smaller doc id) shares ANY (band_id, band_sig)
  * with it. "Earlier" counts every processed document, accepted or not —
  * a rejected near-duplicate still poisons later lookalikes, exactly as a
  * Bloom/band index that records all seen content behaves. That choice is
  * what makes the operator incrementally computable AND globally
  * order-free: running it batch-by-batch yields byte-identical survivors
  * to one global pass ordered by doc id (`q_text_dedup_incremental`
  * proves this equivalence against a DuckDB NOT EXISTS over the full
  * corpus).
  *
  * Exactly-once and replay: index rows are stamped with their batch id and
  * committed via [[LakehouseTable.appendStream]], whose per-query watermark
  * swallows crash-replays. History is read as `batch_id < thisBatch`, so a
  * REPLAYED step returns the same survivor set it originally produced even
  * though its own signatures are already in the index — the stamp, not
  * timing, defines "earlier".
  *
  * 100 TB shape: the probe is one equality join on (band_id, band_sig) —
  * no all-pairs anywhere. The index table is `bucket[N]`-partitioned on
  * band_sig, so files cluster by signature hash: compaction keeps each
  * bucket's rows together, manifest pruning bounds the slice of index any
  * probe task reads, and the probe join co-partitions with the table
  * layout instead of reshuffling the full history. Steps cost
  * O(batch · bands) probe rows against an index read that prunes to the
  * touched buckets.
  */
object DedupIndex {

  /** Schema of the persisted index: one row per (document, band). */
  val indexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_id", LongType),
    StructField("band_sig", LongType),
    StructField("batch_id", LongType)))

  /** Create (or reopen) a band index table under `tableDir`,
    * bucket-partitioned on band_sig so probe joins align with file layout.
    */
  def createIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: org.apache.hadoop.fs.Path,
      buckets: Int = 8): LakehouseTable = {
    val t = LakehouseTable.createIfNotExists(
      spark, tableDir, indexSchema, Seq("band_sig" -> s"bucket[$buckets]"))
    // hash write distribution: each append clusters on the bucket dirs
    // first, so a commit lands ONE file per touched bucket instead of
    // (write tasks × buckets) — without it a 32-task micro-batch sprays
    // up to 256 tiny files per step and the per-commit footer-stats
    // pass dominates the step. The added shuffle is O(batch).
    if (!t.metadata.props.contains("write.distribution-mode"))
      t.setProperty("write.distribution-mode", "hash")
    t
  }

  /** One incremental step: persist `batchBands` (rows of doc_id,
    * band_id, band_sig — e.g. [[graft.ops.DedupOps.lshBands]] output
    * renamed, or the portable-minhash banding) exactly-once under
    * (queryId, batchId), then dedup them against everything the index
    * has seen in batches before `batchId` — the probe reads the
    * just-committed files, so signatures are computed once per step.
    *
    * Returns the surviving doc ids (one column, `doc_id`). The frame is
    * lazy but deterministic under re-evaluation: history is pinned by the
    * `batch_id < batchId` stamp, not by when the read plans.
    */
  def step(
      index: LakehouseTable,
      batchBands: DataFrame,
      queryId: String,
      batchId: Long,
      settledBefore: Option[Long] = None): DataFrame = {
    val (bands, dropped) = probeAndCommit(
      index, batchBands, queryId, batchId, settledBefore)
    bands.select("doc_id").distinct()
      .join(dropped, Seq("doc_id"), "left_anti")
  }

  /** The complement of [[step]]: the doc ids REJECTED by this batch's
    * probe (duplicate of history or of a smaller-id batch member).
    * Consumers that must pass through documents with no signature rows
    * at all (too short to shingle — nothing to match, so not a
    * duplicate) anti-join their delta against this instead of
    * semi-joining against [[step]]'s survivors; [[DedupStream]] does.
    * Commits the index append exactly like [[step]] — call one or the
    * other per batch, not both.
    */
  def stepDropped(
      index: LakehouseTable,
      batchBands: DataFrame,
      queryId: String,
      batchId: Long,
      settledBefore: Option[Long] = None): DataFrame =
    probeAndCommit(index, batchBands, queryId, batchId, settledBefore)._2

  /** Commit a batch's signatures exactly-once WITHOUT probing — the
    * first half of [[step]], exposed for callers that sequence several
    * arrivals and then derive every batch's survivors from ONE read of
    * the final index ([[survivorsFromCommitted]]): the `batch_id`
    * stamps make history filters time-invariant, so a probe computed
    * against any LATER committed state returns byte-identical
    * survivors — and the shared scan replaces K per-step file reads.
    */
  def commitBatch(
      index: LakehouseTable,
      batchBands: DataFrame,
      queryId: String,
      batchId: Long): Unit = {
    val staged = batchBands.select(
      col("doc_id").cast(LongType).as("doc_id"),
      col("band_id").cast(LongType).as("band_id"),
      col("band_sig").cast(LongType).as("band_sig"))
    index.appendStream(queryId, batchId, staged.withColumn("batch_id", lit(batchId)))
    ()
  }

  /** Survivors of batch `batchId` derived from `committed` — any read
    * of the index taken AT or AFTER that batch's commit (a caller
    * sequencing several commits passes one final — ideally persisted —
    * read for all of them). Time-invariance argument in
    * [[commitBatch]]'s scaladoc.
    */
  def survivorsFromCommitted(
      committed: DataFrame,
      batchId: Long,
      settledBefore: Option[Long] = None,
      /** Pass true ONLY when every batch before `batchId` was fully
        * delivered AND settled (no crash slivers — e.g. a sequential
        * backfill): skips the current-batch doc-exclusion join, which
        * the settledness makes a provable no-op. [[step]] derives the
        * equivalent proof automatically from the index watermark.
        */
      priorSettled: Boolean = false): DataFrame = {
    val (bands, dropped) =
      probeCommitted(committed, batchId, settledBefore, priorSettled)
    bands.select("doc_id").distinct()
      .join(dropped, Seq("doc_id"), "left_anti")
  }

  /** BULK backfill derivation (optimization r19): every batch's
    * survivors from ONE pass over a committed index read, replacing K
    * per-batch [[survivorsFromCommitted]] probes (each several
    * joins/distincts/broadcast builds) when a caller has sequenced K
    * settled, disjoint commits and wants them all. Returns
    * (doc_id, batch) — filter on `batch` for a single batch's set.
    *
    * The derivation: within each (band_id, band_sig) partition the
    * first row by (batch_id, doc_id) is the signature's first-seen
    * occurrence; a doc survives iff EVERY one of its rows is its
    * signature's first — exactly online first-seen-wins (an earlier
    * batch's row, accepted or rejected, or a smaller same-batch id,
    * makes some row non-first). One window + one per-doc aggregate;
    * the window keys on the same (band, sig) clustering the index's
    * bucket partitioning already groups.
    *
    * PRECONDITIONS (the sequential-backfill shape, same as passing
    * `priorSettled = true` per batch): batches are doc-disjoint and
    * fully delivered — no crash slivers. Byte-equivalence to the
    * per-batch probes under these preconditions is spec-asserted
    * (DedupIndexSpec) and oracle-checked end to end
    * (q_text_dedup_incremental).
    */
  def survivorsBackfill(committed: DataFrame): DataFrame = {
    val wSig = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_sig")
    committed
      .withColumn("__graft_first",
        min(struct(col("batch_id"), col("doc_id"))).over(wSig))
      .withColumn("__graft_dup",
        when(struct(col("batch_id"), col("doc_id")) =!= col("__graft_first"),
          1).otherwise(0))
      .groupBy(col("doc_id"), col("batch_id"))
      .agg(max(col("__graft_dup")).as("__graft_any"))
      .filter(col("__graft_any") === 0)
      .select(col("doc_id"), col("batch_id").as("batch"))
  }

  private def probeAndCommit(
      index: LakehouseTable,
      batchBands: DataFrame,
      queryId: String,
      batchId: Long,
      settledBefore: Option[Long]): (DataFrame, DataFrame) = {
    // COMMIT FIRST, probe from the committed files: the exactly-once
    // staged append is the single materialization of this batch's
    // signatures — the probe's three consumers (history semi-join,
    // bucket-min aggregate, survivor projection) then read them back
    // from the index's columnar files instead of re-deriving
    // shingle→minhash per join (previously up to 3× recompute per
    // step). Order is safe under every replay shape: a same-batch-id
    // replay no-ops on the watermark and reads the original commit's
    // rows; a crash-retry under a NEW batch id re-appends the merged
    // delta under the new stamp (duplicate signature rows are harmless
    // membership-wise and collapse in [[compactIndex]]), so the
    // `batch_id = batchId` read below always holds exactly this
    // step's bands.
    // fast-path detection BEFORE our own commit moves the watermark:
    // the index's appendStream watermark is the max stamp it holds, so
    // watermark <= settledBefore proves every prior row's stamp is at
    // or below the consumer's settled point — the doc-exclusion filter
    // below would pass every row, and its broadcast build can be
    // skipped. A crash-sliver (index committed, consumer didn't settle)
    // leaves the watermark ABOVE settledBefore, so the slow path
    // engages exactly when the exclusion can matter; the flag never
    // changes results, only the plan.
    val priorSettled = index.metadata.streamWatermarks.get(queryId)
      .forall(_ <= settledBefore.getOrElse(Long.MinValue))
    commitBatch(index, batchBands, queryId, batchId)
    probeCommitted(index.read(), batchId, settledBefore, priorSettled)
  }

  private def probeCommitted(
      committed: DataFrame,
      batchId: Long,
      settledBefore: Option[Long],
      /** Caller-proven "every prior stamp <= settledBefore": skip the
        * current-batch doc-exclusion join (a no-op under the proof).
        */
      priorSettled: Boolean = false): (DataFrame, DataFrame) = {
    val bands = committed.filter(col("batch_id") === lit(batchId))
      .select("doc_id", "band_id", "band_sig")

    // Seen-before probe, shaped so the INDEX IS ONLY EVER SCANNED,
    // never shuffled: every join against history broadcasts the
    // micro-batch-sized side (a trigger's bands fit the driver by the
    // micro-batch contract), so the index scan is a map-side hash
    // probe — one pass over the (bucket-pruned) files, zero exchange
    // of index rows. All shuffles below are O(batch). That is both the
    // 100 TB shape (the index dwarfs any delta) and the local win (the
    // previous formulation shuffled the full history per step).
    //
    // History must exclude rows belonging to the CURRENT batch's docs:
    // in a clean run batches are disjoint and the exclusion is a no-op,
    // but after a crash between the index commit and the consumer's
    // commit ([[DedupStream]]), the retried trigger can span a LARGER
    // delta under a new batch id — and without the exclusion the
    // half-committed batch's signatures would poison its own re-run
    // (its docs collide with themselves; worse, a smaller-id newcomer
    // sharing a band kills BOTH copies: the old doc intra-batch, the
    // newcomer against the ghost signature). Excluding current-batch
    // doc ids makes the retry compute first-seen-wins over the merged
    // delta exactly as if it were the batch originally delivered —
    // crash-consistent with no recovery protocol. `settledBefore` (the
    // consumer's committed watermark) bounds the exclusion: stamps at
    // or below it are provably from disjoint, delivered batches and
    // skip the doc-id check entirely.
    val prior = committed.filter(col("batch_id") < lit(batchId))
    val batchDocs = bands.select("doc_id").distinct()
    val batchSigs = bands.select("band_id", "band_sig").distinct()
    val wmLit = lit(settledBefore.getOrElse(Long.MinValue))
    // history signatures this batch collides with: semi-probe keeps the
    // output batch-bounded even when a hot signature occurs millions of
    // times in history
    val seenRaw = prior
      .join(broadcast(batchSigs), Seq("band_id", "band_sig"), "left_semi")
    val seenSigs = (if (priorSettled) seenRaw
      else seenRaw
        .join(broadcast(batchDocs.withColumn("__graft_cur", lit(true))),
          Seq("doc_id"), "left")
        .filter(col("batch_id") <= wmLit || col("__graft_cur").isNull))
      .select("band_id", "band_sig")
      .distinct()
    // a doc is dropped iff ANY of its buckets was seen in history or
    // holds a smaller same-batch doc id; the intra rule rides a window
    // over the same (band, sig) clustering instead of a second
    // aggregate+join over the batch
    val wSig = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_sig")
    val dropped = bands
      .withColumn("__graft_first", min(col("doc_id")).over(wSig))
      .join(broadcast(seenSigs.withColumn("__graft_seen", lit(true))),
        Seq("band_id", "band_sig"), "left")
      .filter(col("__graft_seen").isNotNull || col("__graft_first") < col("doc_id"))
      .select("doc_id")
      .distinct()
    (bands, dropped)
  }

  /** Index maintenance: collapse the table to ONE row per distinct
    * (band_id, band_sig), keeping the minimum doc id and batch id.
    * Probes only test signature membership, so the index need never be
    * larger than the distinct-signature set — without this, a corpus
    * with heavy duplication (the whole reason to dedup) grows the index
    * O(all seen docs · bands) instead of O(distinct sigs).
    *
    * Replay safety: a future step `b` filters `batch_id < b`; keeping
    * the MIN batch id per signature can only keep a signature visible
    * for every filter that saw it before, and a replayed PAST batch `k`
    * sees exactly the signature set it originally did — a sig first
    * seen in `j < k` collapses to `batch_id = j` (still `< k`, still
    * visible), one first seen in `k` itself collapses to `batch_id = k`
    * (still excluded, as its own batch). Survivor sets are therefore
    * byte-identical across compaction (spec-asserted), and the
    * overwrite commit preserves stream watermarks, so the exactly-once
    * guard is untouched.
    */
  def compactIndex(index: LakehouseTable): Long = {
    val compacted = index.read()
      .groupBy("band_id", "band_sig")
      .agg(min(col("doc_id")).as("doc_id"), min(col("batch_id")).as("batch_id"))
      .select("doc_id", "band_id", "band_sig", "batch_id")
    index.overwrite(compacted).id
  }
}
