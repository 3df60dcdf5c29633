package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The two `private[sql]` bridges a V1 streaming `Source`/`Sink` needs,
  * isolated in an `org.apache.spark.sql` subpackage so the rest of the
  * engine stays on public API. Both are the exact moves Spark's own
  * sources make:
  *
  *   - [[asStreaming]] is `FileStreamSource.getBatch`'s trick: re-tag
  *     the batch plan's leaf relations `isStreaming = true` so
  *     `MicroBatchExecution`'s sanity assert accepts the micro-batch.
  *     The tag changes NOTHING about planning — the leaves stay plain
  *     parquet relations, so pushdown, pruning and whole-stage codegen
  *     apply to each micro-batch exactly as to a batch read. This holds
  *     for APPEND-ONLY deltas (the common steady-state batch), which
  *     take the leaf re-tag path below. A join-bearing micro-batch
  *     (MoR delete masks, change-feed pre-images) is instead pinned as
  *     a pre-optimized `LogicalRDD` — the join itself was planned with
  *     full pushdown into its own scans, but filters/projections the
  *     DOWNSTREAM streaming query adds cannot push through that
  *     boundary into the parquet scans. Perf-only, micro-batch-scoped;
  *     a consumer that needs scan-level pushdown over heavy downstream
  *     predicates should read append-only deltas (emitUpserts=false)
  *     or filter before the feed via the source options.
  *   - [[asBatch]] is `ForeachBatchSink`'s trick: pin the micro-batch's
  *     physical RDD under a fresh batch-tagged `LogicalRDD`, so a sink
  *     can drive a normal batch write from a streaming plan (directly
  *     calling `.write` on the incoming frame would throw
  *     "streaming sources must be executed with writeStream").
  */
object StreamShim {

  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val analyzed = ds.queryExecution.analyzed
    val needsWrap = analyzed.collectFirst {
      // a join whose leaves are streaming-tagged would plan as a
      // STATEFUL streaming join (and e.g. reject the LeftAnti the
      // merge-on-read delete mask uses) — but the join here is plain
      // batch work scoped to one micro-batch
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      // a LogicalRDD leaf (the empty-delta frame) has no copyable
      // isStreaming flag from outside its second parameter list
      case r: LogicalRDD => r
    }.isDefined
    if (needsWrap)
      // pin the batch's physical RDD under one streaming-tagged
      // LogicalRDD: the batch plan inside (pushdown, broadcasts,
      // codegen) is already optimized; only the micro-batch boundary
      // node changes.
      Dataset.ofRows(ds.sparkSession,
        LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true))
    else
      Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession],
        analyzed.transform {
          case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
          case lr: LocalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
        })
  }

  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution match {
      case _: org.apache.spark.sql.execution.streaming.runtime.IncrementalExecution =>
        // engine-delivered micro-batch: its execution already carries
        // the stateful operators' state stores — pin ITS rdd; re-planning
        // from the logical plan would re-run stateful ops stateless
        Dataset.ofRows(ds.sparkSession,
          LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
      case _ =>
        // a fresh streaming-tagged wrapper (e.g. a Source.getBatch
        // result outside an engine, as the specs replay them): just
        // drop the tags — the plan is ordinary batch work
        Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession],
          ds.queryExecution.analyzed.transform {
            case lr: LogicalRelation if lr.isStreaming => lr.copy(isStreaming = false)
            case lr: LocalRelation if lr.isStreaming => lr.copy(isStreaming = false)
          })
    }
  }
}
