package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{StructField, StructType}

/** DSv2 read path for graft tables (round 16, VERDICT r15 #3). Two
  * scans come out of the one builder:
  *
  *   - [[SupportsPushDownAggregates]] (COMPLETE pushdown only): an
  *     ungrouped count/count(col)/min/max/sum whose answer is provable
  *     from the snapshot's manifest roll-ups — the SAME
  *     [[graft.lake.MetadataAggInfo]] + [[MetadataAggFacts]] gates the
  *     SQL rewrite uses — becomes a [[LocalScan]] of the precomputed
  *     row: `spark.table(t).count()` plans ZERO data files even for a
  *     catalog user who never installed the extension rule. Every
  *     unprovable shape (live merge-on-read masks, renamed columns,
  *     truncated string bounds, unproven double pairs, unprovable sum
  *     overflow, FILTER/DISTINCT, grouped aggregation) is REFUSED,
  *     not approximated.
  *   - everything else falls back to a [[V1Scan]] that executes the
  *     table's native read plan ([[GraftReadableTable.readDF]] —
  *     manifest-planned, merge-on-read-aware, time-travel-pinned) and
  *     hands Spark its RDD. This replaces the pre-r16 hard failure:
  *     the failure existed so a bare file scan could not resurrect
  *     masked rows, and the native plan cannot — so bare DSv2 reads
  *     (`spark.table(t).collect()` on the unexpanded relation, or any
  *     read without the extension rule) are now correct instead of
  *     refused. Real queries still splice natively through
  *     [[GraftRelationExpansion]]; this path is the safety net, so it
  *     stays deliberately simple (column pruning only — a filter above
  *     it re-applies exactly, just unpruned).
  */
final class GraftScanBuilder(table: GraftReadableTable)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: Option[StructType] = None
  private var pushed: Option[GraftMetadataAggScan] = None
  // supportCompletePushDown and pushAggregation arrive back to back
  // with the same Aggregation — cache one translation (it reads the
  // manifest list and parses the schema DDL)
  private var lastAgg: Option[(Aggregation, Option[GraftMetadataAggScan])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  private def translated(agg: Aggregation): Option[GraftMetadataAggScan] =
    lastAgg match {
      case Some((a, r)) if a == agg => r
      case _ =>
        val r = translate(agg)
        lastAgg = Some((agg, r))
        r
    }

  /** The precomputed metadata answer, or None ⇔ not provable. Runs at
    * PLANNING time and costs one manifest-LIST read (cached) — the
    * whole point is that no Spark job runs at all.
    */
  private def translate(agg: Aggregation): Option[GraftMetadataAggScan] =
    table match {
      case g: GraftSqlTable if agg.groupByExpressions.isEmpty =>
        val info = g.lt.metadataAggInfo(g.pinnedSnapshot).getOrElse(return None)
        val facts = new MetadataAggFacts(info, g.lt.metadata)
        def col(e: org.apache.spark.sql.connector.expressions.Expression)
            : Option[String] = e match {
          case f: NamedReference if f.fieldNames.length == 1 =>
            Some(f.fieldNames()(0))
          case _ => None
        }
        val lits = agg.aggregateExpressions.toSeq.map {
          case _: CountStar =>
            org.apache.spark.sql.catalyst.expressions.Literal(facts.countStar)
          case c: Count if !c.isDistinct =>
            col(c.column).flatMap(facts.countCol)
              .map(org.apache.spark.sql.catalyst.expressions.Literal(_))
              .getOrElse(return None)
          case m: Min =>
            col(m.column).flatMap(facts.extreme(_, wantMin = true))
              .getOrElse(return None)
          case m: Max =>
            col(m.column).flatMap(facts.extreme(_, wantMin = false))
              .getOrElse(return None)
          case s: Sum if !s.isDistinct =>
            // the DSv2 Aggregation carries no eval mode — demand the
            // no-overflow proof, which is sound under every mode
            col(s.column).flatMap(facts.sumCol(_, requireNoOverflowProof = true))
              .getOrElse(return None)
          case _ => return None
        }
        // nullable across the board: aggregate results are nullable in
        // general (min/max/sum of an empty or all-null table), and
        // claiming non-null is the direction that could mislead a
        // downstream optimization — a LocalScan pays nothing for it
        val schema = StructType(lits.zipWithIndex.map { case (l, i) =>
          StructField(s"_pushed_agg_$i", l.dataType, nullable = true)
        })
        // Literal.value is already the Catalyst-internal representation
        // (micros for timestamps, UTF8String for exactness-marked
        // string extremes)
        Some(new GraftMetadataAggScan(schema,
          Array(new GenericInternalRow(lits.map(_.value).toArray))))
      case _ => None
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translated(agg).isDefined

  /** COMPLETE pushdown only: on `true` Spark splices the scan's row in
    * place of the whole Aggregate. (Serving the same row in PARTIAL
    * mode would also re-aggregate correctly for count/min/max, but
    * complete is what the metadata answer is — refuse anything Spark
    * would want partials for.)
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translated(agg)
    pushed = t
    t.isDefined
  }

  override def build(): Scan =
    pushed.getOrElse(new GraftV1FallbackScan(table, required))
}

/** The pushed-aggregate answer as a driver-local scan: Spark plans it
  * as a LocalTableScan — no file, no task, no shuffle.
  */
final class GraftMetadataAggScan(
    schema: StructType, rowData: Array[InternalRow]) extends LocalScan {
  override def rows(): Array[InternalRow] = rowData
  override def readSchema(): StructType = schema
  override def description(): String = "GraftMetadataAggScan(manifest roll-ups)"
}

/** Fallback scan: the table's native read plan behind the V1 bridge.
  * `buildScan` materializes the native DataFrame's RDD — the plan
  * inside it is the fully-pruned, mask-aware splice, executed as its
  * own (codegen'd) subplan; only the Row bridge at the boundary is
  * uncodegen'd, and only the bare-relation shapes ever land here.
  */
final class GraftV1FallbackScan(
    table: GraftReadableTable, required: Option[StructType]) extends V1Scan {
  /** Top-level pruning only: V2ScanRelationPushDown may hand
    * `pruneColumns` a NESTED-pruned schema (a struct with fewer
    * fields), but `buildScan`'s select returns FULL structs and the V1
    * bridge converts rows positionally against the declared schema —
    * declaring the pruned struct would silently mis-read its fields.
    * So the declared schema is rebuilt from the table's own full field
    * definitions, keeping only the required TOP-LEVEL names.
    */
  private def schemaOut: StructType = required match {
    case Some(req) =>
      StructType(req.fieldNames.toIndexedSeq
        .flatMap(n => table.schema.fields.find(_.name == n)))
    case None => table.schema
  }

  override def readSchema(): StructType = schemaOut

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val out = schemaOut
    val t = table
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = out
      override def buildScan(): RDD[Row] = {
        val df = t.readDF()
        val pruned =
          if (out.fieldNames.sameElements(df.columns)) df
          else df.select(out.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*)
        pruned.rdd
      }
    }.asInstanceOf[T]
  }

  override def description(): String = "GraftV1FallbackScan(native read plan)"
}
