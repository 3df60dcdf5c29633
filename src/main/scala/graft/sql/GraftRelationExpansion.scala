package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand

/** Expands every [[GraftSqlTable]] relation into the table's NATIVE read
  * plan (view-expansion style): the plan [[graft.lake.LakehouseTable
  * .read]] builds — manifest-pruned parquet relations, per-spec
  * partition recovery, alias-coalesce, merge-on-read delete anti-joins,
  * time-travel pinning — spliced in under a `Project` that re-aliases
  * the expansion's output to the relation's original attribute ids, so
  * references above the relation stay valid.
  *
  * Runs as a POST-HOC resolution rule: after the analyzer resolved
  * identifiers (so `INSERT INTO` targets already became
  * [[V2WriteCommand]]s whose table leg we must NOT expand — writes go
  * through the table's own V1 write path), and before the optimizer —
  * so filter pushdown, column pruning and partition pruning all see
  * plain parquet relations and behave exactly as they do for the
  * DataFrame API. Injected by `graft.functions.GraftExtensions`.
  */
case class GraftRelationExpansion(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = expand(plan)

  private def expand(plan: LogicalPlan): LogicalPlan = {
    val expanded = plan match {
      case w: V2WriteCommand =>
        // the write TARGET stays a relation (its V1 write path needs it);
        // the source query leg still expands (INSERT INTO t SELECT FROM t)
        w.withNewChildren(w.children.map(c => if (c eq w.table) c else expand(c)))
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        val child = r.table.asInstanceOf[GraftSqlTable].readDF().queryExecution.analyzed
        // project BY NAME onto the relation's attribute ids: the native
        // plan also carries derived partition-layout columns, which the
        // SQL schema hides (Iceberg-style hidden partitioning) — they are
        // simply not selected here, and Catalyst prunes them away
        Project(
          r.output.map { target =>
            val src = child.output.find(_.name == target.name).getOrElse(
              throw new IllegalStateException(
                s"expansion schema drift: '${target.name}' missing from " +
                  s"native plan columns ${child.output.map(_.name).mkString(", ")}"))
            Alias(src, target.name)(exprId = target.exprId)
          },
          child)
      case other => other.mapChildren(expand)
    }
    // subquery plans live inside expressions, not children
    expanded.transformExpressionsDown {
      case se: SubqueryExpression => se.withNewPlan(expand(se.plan))
    }
  }
}
