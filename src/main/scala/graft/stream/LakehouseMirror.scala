package graft.stream

import graft.lake.{LakehouseTable, Snapshot}
import org.apache.spark.sql.DataFrame

/** Exactly-once incremental table-to-table pipelines — the downstream
  * materialization pattern (bronze → silver/gold) built from two
  * primitives that already carry the guarantees:
  *
  *   - [[LakehouseTable.readIncremental]] plans the delta between two
  *     snapshots from added manifests alone (O(changed data) read);
  *   - [[LakehouseTable.appendStream]] commits the transformed delta
  *     and the consumer's watermark in ONE atomic metadata commit.
  *
  * The watermark VALUE is the source snapshot id (snapshot ids are
  * strictly increasing, so they serve as batch ids), stored in the
  * DESTINATION table's metadata — the offset lives transactionally with
  * the data it produced, which is what makes a crash between "process"
  * and "record offset" unrepresentable: either the commit happened
  * (watermark moved) or it didn't (delta re-derived next step). No
  * external offset store, no two-phase protocol.
  */
object LakehouseMirror {

  /** One incremental step: read the source delta since the last synced
    * snapshot, apply `transform`, append exactly-once to `dst`.
    * Returns the committed destination snapshot, or None when there is
    * nothing new (or the delta transformed to empty). Run it from a
    * scheduler or a watcher callback; each call is independent and
    * crash-safe at any point.
    *
    * First sync ships the full current snapshot. Maintenance commits
    * (compact/fold) in the source range are skipped by construction;
    * a row-removing source commit (COW/MoR delete) fails the step
    * loudly — mirror the deletes explicitly or re-seed the destination.
    */
  def step(
      src: LakehouseTable,
      dst: LakehouseTable,
      consumerId: String,
      transform: DataFrame => DataFrame = identity): Option[Snapshot] = {
    val curId = src.metadata.currentSnapshotId.getOrElse(return None) // empty source
    val last = dst.metadata.streamWatermarks.get(consumerId)
    if (last.exists(_ >= curId)) return None // already synced
    val delta = last match {
      case Some(l) => src.readIncremental(l, curId)
      case None => src.timeTravel(curId) // first sync: full snapshot image
    }
    val committed = dst.appendStream(consumerId, curId, transform(delta))
    // a non-empty source delta whose TRANSFORM is empty commits nothing,
    // so the watermark must advance by metadata-only commit — otherwise
    // every later step re-plans and re-transforms the same growing delta
    // (unbounded rework for a selective filter; ADVICE r6). A replayed
    // batchId inside advanceStreamWatermark no-ops, keeping this safe
    // against a concurrent step of the same consumer.
    if (committed.isEmpty) dst.advanceStreamWatermark(consumerId, curId)
    committed
  }
}
