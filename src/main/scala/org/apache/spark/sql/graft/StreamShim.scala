package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project, SubqueryAlias, Union}
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
  *     apply to each micro-batch exactly as to a batch read. APPEND-ONLY
  *     deltas (the common steady-state batch) re-tag every leaf; a
  *     JOIN-bearing micro-batch (MoR delete masks, change-feed
  *     pre-images) re-tags only the streamable SPINE ([[tagSpine]]) so
  *     the joins plan as ordinary stream-static joins and the parquet
  *     leaves keep accepting DOWNSTREAM filter/projection pushdown
  *     (plan-asserted in GraftTableSourceSpec). Plans the spine rules
  *     can't prove safe fall back to a pre-optimized `LogicalRDD` pin —
  *     correct, with pushdown stopping at the pin boundary.
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
    val hasJoin = analyzed.exists(_.isInstanceOf[Join])
    val hasRdd = analyzed.exists(_.isInstanceOf[LogicalRDD])
    if (!hasJoin && !hasRdd)
      // append-only delta: every leaf re-tags and the micro-batch plans
      // exactly like a batch read (pushdown, pruning, codegen intact)
      Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession],
        analyzed.transform {
          case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
          case lr: LocalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
        })
    else
      // join-bearing delta (MoR masks, change-feed pre-images): tag the
      // STREAMABLE SPINE only, so the micro-batch plans as stream-static
      // joins — ordinary per-batch joins whose parquet leaves keep
      // accepting DOWNSTREAM filter/projection pushdown (previously the
      // whole batch was pinned pre-optimized and downstream predicates
      // stopped at the LogicalRDD boundary). Falls back to the pin when
      // the plan has any shape the spine rules don't prove safe.
      tagSpine(analyzed)
        .map(Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession], _))
        .getOrElse(Dataset.ofRows(ds.sparkSession,
          LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true)))
  }

  /** Re-tag `isStreaming` along the streamable spine of a join-bearing
    * batch plan, and ONLY there. Safety invariants, both load-bearing:
    *
    *   - no join may end up with BOTH sides streaming-tagged (Spark
    *     would plan a stateful stream-stream join for what is plain
    *     batch work scoped to one micro-batch), so the walk descends
    *     exactly one side of every join — the side Spark's
    *     stream-static support allows for that join type (left for
    *     inner/cross/left-outer/semi/anti, right for right-outer);
    *   - no streaming tag may sit under an operator that
    *     IncrementalExecution would plan STATEFULLY (aggregates,
    *     windows, dedup, limits…), so every node on and above the
    *     spine must belong to a stateless whitelist.
    *
    * Returns None — caller falls back to the pre-optimized pin — when a
    * full-outer join, a non-whitelisted node, or a LogicalRDD leaf
    * (the empty-delta frame, whose tag is not copyable) sits on the
    * spine, or when no leaf could be tagged at all.
    */
  private def tagSpine(plan: LogicalPlan): Option[LogicalPlan] = {
    var ok = true
    def go(p: LogicalPlan): LogicalPlan = p match {
      case lr: LogicalRelation => if (lr.isStreaming) lr else lr.copy(isStreaming = true)
      case lr: LocalRelation => if (lr.isStreaming) lr else lr.copy(isStreaming = true)
      case j: Join => j.joinType match {
        case Inner | Cross | LeftOuter | LeftSemi | LeftAnti =>
          j.copy(left = go(j.left))
        case RightOuter => j.copy(right = go(j.right))
        case _ => ok = false; j
      }
      case u: Union => u.withNewChildren(u.children.map(go))
      case f: Filter => f.copy(child = go(f.child))
      case pr: Project => pr.copy(child = go(pr.child))
      case a: SubqueryAlias => a.copy(child = go(a.child))
      case other => ok = false; other // LogicalRDD, stateful ops, unknowns
    }
    val tagged = go(plan)
    if (ok && tagged.isStreaming) Some(tagged) else None
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
