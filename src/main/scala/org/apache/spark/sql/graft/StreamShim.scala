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
  *     apply to each micro-batch exactly as to a batch read.
  *   - [[asBatch]] is `ForeachBatchSink`'s trick: pin the micro-batch's
  *     physical RDD under a fresh batch-tagged `LogicalRDD`, so a sink
  *     can drive a normal batch write from a streaming plan (directly
  *     calling `.write` on the incoming frame would throw
  *     "streaming sources must be executed with writeStream").
  */
object StreamShim {

  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val tagged = ds.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case lr: LocalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    Dataset.ofRows(ds.sparkSession.asInstanceOf[SparkSession], tagged)
  }

  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
