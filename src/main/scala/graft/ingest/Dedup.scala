package graft.ingest

import graft.lake.LakehouseTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Unbounded-history deduplication against the table's full live data —
  * the reference's `deduplicate`
  * (`/root/reference/lakehouse_pipeline.py:204-227`), whose PyArrow
  * `unique`→`is_in`→`invert` chain materializes every existing key in
  * memory. At 100 TB that is the design-breaking step, so we re-express
  * it Spark-first:
  *
  *   1. Partition-prune the existing side to the years actually present
  *      in the incoming batch (one tiny agg on the batch; the year filter
  *      hits the hive-style partition dirs, so existing data outside the
  *      batch's time range is never read).
  *   2. When the table records manifest key blooms
  *      (`write.key-bloom.bits`), prune the WITHIN-bounds files too:
  *      a distributed probe of the batch's keys against the broadcast
  *      per-file blooms drops every candidate file that provably
  *      shares no key with the batch, before it is ever opened
  *      ([[LakehouseTable.readRangeForKeys]] — SURVEY §7.5 /
  *      VERDICT r10 #6). Zero false-negative skips by construction;
  *      tables without blooms degrade to step 1 exactly.
  *   3. LEFT ANTI join on the key. Catalyst/AQE picks broadcast-anti when
  *      the pruned existing key set is small and shuffled-hash otherwise;
  *      nothing is ever collected to the driver.
  */
object Dedup {

  def dropExisting(newDf: DataFrame, table: LakehouseTable, key: String): DataFrame = {
    val meta = table.metadata
    if (meta.currentSnapshot.isEmpty) return newDf

    // one tiny agg on the batch → [lo, hi] of the key in epoch micros;
    // the manifest's per-file footer stats then skip every existing file
    // outside that range BEFORE Spark plans the scan (finer than the
    // year-partition pruning, which it subsumes), and the manifest
    // blooms skip within-range files sharing no key with the batch
    val pruned = if (meta.partitionTransform.contains(key)) {
      val keyUs = unix_micros(col(key).cast(TimestampType))
      val Array(lo, hi) = newDf.agg(min(keyUs), max(keyUs)).head().toSeq.toArray
      (lo, hi) match {
        case (l: Long, h: Long) =>
          table.readRangeForKeys(l, h, newDf.select(keyUs.as("_ku")))
        case _ => table.read() // batch key entirely null: nothing to prune on
      }
    } else table.read()
    newDf.join(pruned.select(col(key)), Seq(key), "left_anti")
  }

  /** Within-batch exact dedup on a key (keep an arbitrary single row per
    * key, matching dropDuplicates semantics). The reference does NOT
    * dedup within a batch (SURVEY.md §2.3) — exposed separately so the
    * pipeline can opt in.
    */
  def withinBatch(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)
}
