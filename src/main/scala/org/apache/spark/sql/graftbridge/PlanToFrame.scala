package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `Dataset.ofRows` (a `private[sql]` constructor): wraps an
  * already-analyzed LogicalPlan as a DataFrame. Needed exactly once, by
  * the SQL MERGE command, whose USING source arrives as a resolved plan
  * that must feed the native upsert as a frame. Lives under
  * `org.apache.spark.sql` solely to satisfy the access qualifier — the
  * standard connector idiom for this API (no Spark internals are
  * modified or shadowed).
  */
object PlanToFrame {
  def apply(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
