package graft.sql

import graft.lake.LakehouseTable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance procedures (Iceberg's `CALL catalog.system.*`
  * surface, VERDICT r8 #7): every native maintenance verb of
  * [[LakehouseTable]] reachable from pure SQL through Spark's DSv2
  * procedure API —
  *
  * {{{
  * CALL graft.system.rewrite_data_files(table => 'gold.ticks')
  * CALL graft.system.expire_snapshots('gold.ticks', 0, 2)
  * CALL graft.system.rollback_to_snapshot('gold.ticks', 3)
  * CALL graft.system.zorder('gold.ticks', 'user_id,value')
  * CALL graft.system.rewrite_manifests('gold.ticks')
  * CALL graft.system.remove_orphan_files('gold.ticks')
  * CALL graft.system.maintain('gold.ticks')
  * }}}
  *
  * Thin by design: each procedure parses its arguments, drives the ONE
  * native code path the DataFrame API already uses (same commit
  * protocol, same crash-safety ordering, same retry semantics — not a
  * second maintenance implementation to keep correct), and returns its
  * report as a single-row [[LocalScan]]. Names follow Iceberg's
  * procedure vocabulary so an Iceberg user's runbooks port verbatim;
  * `zorder` and `maintain` are engine extensions (Iceberg spells the
  * former `rewrite_data_files(strategy => 'sort', ...)` and has no
  * single-call policy-driven cycle at all).
  */
private[sql] object GraftProcedures {

  /** name → constructor, in SHOW PROCEDURES order. */
  val all: Seq[(String, GraftCatalog => UnboundProcedure)] = Seq(
    "rewrite_data_files" -> (new RewriteDataFiles(_)),
    "expire_snapshots" -> (new ExpireSnapshots(_)),
    "rollback_to_snapshot" -> (new RollbackToSnapshot(_)),
    "cherrypick_snapshot" -> (new CherrypickSnapshot(_)),
    "zorder" -> (new ZOrderFiles(_)),
    "rewrite_manifests" -> (new RewriteManifests(_)),
    "remove_orphan_files" -> (new RemoveOrphanFiles(_)),
    "maintain" -> (new Maintain(_)),
    "add_files" -> (new AddFiles(_)),
    "create_branch" -> (new CreateBranch(_)),
    "drop_branch" -> (new DropBranch(_)),
    "create_tag" -> (new CreateTag(_)),
    "drop_tag" -> (new DropTag(_)),
    "fast_forward" -> (new FastForward(_)))

  val byName: Map[String, GraftCatalog => UnboundProcedure] = all.toMap
}

/** Shared shape: bind is identity (parameters are statically typed and
  * Spark coerces/defaults the arguments), the run result is one row.
  */
private[sql] abstract class GraftProcedure(cat: GraftCatalog)
    extends UnboundProcedure with BoundProcedure {

  def outputSchema: StructType
  def run(input: InternalRow): InternalRow

  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val row = run(input)
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outputSchema
      override def description(): String = name()
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  /** First argument of every procedure: the 'namespace.table' name. */
  protected def param0: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("table name as namespace.table").build()

  protected def table(input: InternalRow): LakehouseTable =
    cat.lakeTable(input.getUTF8String(0).toString)

  protected def row(values: Any*): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v.asInstanceOf[AnyRef]
    }.toArray[Any])
}

/** Iceberg `rewrite_data_files` (binpack, Iceberg's default strategy):
  * rewrite only the partition dirs over `target_files`, carrying every
  * well-sized file and untouched manifest by reference. `full => true`
  * forces the whole-table rewrite ([[LakehouseTable.compact]] — the
  * delete-fold / global re-sort verb).
  */
private[sql] final class RewriteDataFiles(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "rewrite_data_files"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("target_files", IntegerType).defaultValue("1")
      .comment("output files per partition dir").build(),
    ProcedureParameter.in("full", BooleanType).defaultValue("false")
      .comment("true = full-table rewrite (folds MoR deletes)").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("files_before", IntegerType, nullable = false),
    StructField("files_after", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val before = t.currentDataFiles.size
    val target = math.max(1, input.getInt(1))
    val snap =
      if (input.getBoolean(2)) t.compact(target) else t.compactBinpack(target)
    row(before, t.currentDataFiles.size, snap.id)
  }
}

private[sql] final class ExpireSnapshots(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "expire_snapshots"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("retention_ms", LongType).defaultValue("604800000")
      .comment("keep snapshots younger than now - retention_ms").build(),
    ProcedureParameter.in("keep_last", IntegerType).defaultValue("2")
      .comment("floor of newest snapshots always retained").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("expired_snapshots", IntegerType, nullable = false),
    StructField("deleted_files", IntegerType, nullable = false),
    StructField("remaining_snapshots", IntegerType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val (expired, deleted) = t.expireSnapshots(
      retentionMs = input.getLong(1), keepLast = input.getInt(2))
    row(expired.size, deleted.size, t.snapshots.size)
  }
}

private[sql] final class RollbackToSnapshot(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "rollback_to_snapshot"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0, ProcedureParameter.in("snapshot_id", LongType).build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("previous_snapshot_id", LongType, nullable = true),
    StructField("current_snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val prev = t.metadata.currentSnapshot.map(_.id)
    val target = input.getLong(1)
    t.rollbackTo(target)
    row(prev.orNull, target)
  }
}

/** Iceberg `cherrypick_snapshot`: replay an append-shaped snapshot
  * (e.g. an audited branch commit fastForward can no longer publish)
  * onto the current head by reference.
  */
private[sql] final class CherrypickSnapshot(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "cherrypick_snapshot"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0, ProcedureParameter.in("snapshot_id", LongType).build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("source_snapshot_id", LongType, nullable = false),
    StructField("current_snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val src = input.getLong(1)
    row(src, table(input).cherrypickSnapshot(src).id)
  }
}

/** Engine extension: z-order compaction on declared cluster columns
  * (multi-dimensional file skipping survives maintenance).
  */
private[sql] final class ZOrderFiles(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "zorder"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("columns", StringType)
      .comment("comma-separated z-order columns").build(),
    ProcedureParameter.in("target_files", IntegerType).defaultValue("4").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("files_after", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val cols = input.getUTF8String(1).toString
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(cols.nonEmpty, "zorder needs at least one column")
    val snap = t.compactZOrder(cols, math.max(1, input.getInt(2)))
    row(t.currentDataFiles.size, snap.id)
  }
}

private[sql] final class RewriteManifests(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "rewrite_manifests"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("cluster_by", StringType).defaultValue("''")
      .comment("partition field to cluster output manifests by " +
        "(one manifest per value — manifest-level identity pruning); " +
        "empty = one global manifest").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val cb = Option(input.getUTF8String(1)).map(_.toString.trim).filter(_.nonEmpty)
    row(table(input).rewriteManifests(cb).id)
  }
}

private[sql] final class RemoveOrphanFiles(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "remove_orphan_files"
  override def parameters(): Array[ProcedureParameter] = Array(param0)
  override val outputSchema: StructType = StructType(Seq(
    StructField("deleted_files", IntegerType, nullable = false)))
  override def run(input: InternalRow): InternalRow =
    row(table(input).removeOrphanedFiles().size)
}

/** Iceberg `add_files`: import existing parquet files (laid out in the
  * table's partition-dir convention) into the table by reference — no
  * data rewrite ([[LakehouseTable.addFiles]]). The SQL onboarding path
  * for a dataset that already exists as parquet.
  */
private[sql] final class AddFiles(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "add_files"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("source_dir", StringType)
      .comment("directory of parquet files in the table's partition layout " +
        "(files are MOVED into the table)").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("added_files", IntegerType, nullable = false),
    StructField("added_rows", LongType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    // same silent-WAP-bypass class as UPDATE/DELETE/MERGE (ADVICE r10):
    // an import mid-staging would commit straight to main while the
    // user believes everything is going through the branch audit
    GraftCatalog.refuseUnderWapBranch(
      org.apache.spark.sql.SparkSession.active, "CALL add_files")
    val snap = table(input).addFiles(
      new org.apache.hadoop.fs.Path(input.getUTF8String(1).toString))
    row(snap.addedFilesCount, snap.addedRows, snap.id)
  }
}

/** Branch/tag ref DDL (VERDICT r9 #6): Iceberg spells these `ALTER
  * TABLE … CREATE BRANCH/TAG` through its SQL-parser extension; this
  * engine's SQL home for ref management is the procedures catalog —
  * each verb drives the ONE native ref path the DataFrame API uses,
  * and `VERSION AS OF '<branch-or-tag>'` reads the refs back, so the
  * whole write-audit-publish cycle runs in pure SQL
  * (`q_lake_sql_wap`).
  */
private[sql] final class CreateBranch(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "create_branch"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("branch", StringType).build(),
    ProcedureParameter.in("snapshot_id", LongType).defaultValue("-1")
      .comment("branch point; -1 = current main head").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val name = input.getUTF8String(1).toString
    val id = input.getLong(2)
    if (id < 0) t.createBranch(name) else t.createBranch(name, id)
    row(name, t.branches(name))
  }
}

private[sql] final class DropBranch(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "drop_branch"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0, ProcedureParameter.in("branch", StringType).build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("dropped", BooleanType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val name = input.getUTF8String(1).toString
    table(input).dropBranch(name)
    row(name, true)
  }
}

private[sql] final class CreateTag(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "create_tag"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0,
    ProcedureParameter.in("tag", StringType).build(),
    ProcedureParameter.in("snapshot_id", LongType).defaultValue("-1")
      .comment("snapshot to pin; -1 = current main head").build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val name = input.getUTF8String(1).toString
    val id = input.getLong(2) match {
      case n if n >= 0 => n
      case _ => t.metadata.currentSnapshotId.getOrElse(
        throw new IllegalStateException("cannot tag an empty table"))
    }
    t.tagSnapshot(name, id)
    row(name, id)
  }
}

private[sql] final class DropTag(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "drop_tag"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0, ProcedureParameter.in("tag", StringType).build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("dropped", BooleanType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val name = input.getUTF8String(1).toString
    table(input).removeTag(name)
    row(name, true)
  }
}

/** Publish a branch to main ([[LakehouseTable.fastForward]] — refuses
  * unless main's head is an ancestor of the branch head, Iceberg's own
  * fast-forward contract; `cherrypick_snapshot` is the escape hatch).
  */
private[sql] final class FastForward(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "fast_forward"
  override def parameters(): Array[ProcedureParameter] = Array(
    param0, ProcedureParameter.in("branch", StringType).build())
  override val outputSchema: StructType = StructType(Seq(
    StructField("previous_snapshot_id", LongType, nullable = true),
    StructField("current_snapshot_id", LongType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val t = table(input)
    val prev = t.metadata.currentSnapshotId
    val published = t.fastForward(input.getUTF8String(1).toString)
    row(prev.orNull, published)
  }
}

/** The deployment shape: one call runs the whole policy-driven cycle
  * (compact-or-fold, expire, reap) with thresholds from table
  * properties — what a scheduler invokes per table per night.
  */
private[sql] final class Maintain(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "maintain"
  override def parameters(): Array[ProcedureParameter] = Array(param0)
  override val outputSchema: StructType = StructType(Seq(
    StructField("compacted", BooleanType, nullable = false),
    StructField("manifests_folded", BooleanType, nullable = false),
    StructField("expired_snapshots", IntegerType, nullable = false),
    StructField("deleted_files", IntegerType, nullable = false),
    StructField("manifests_clustered", BooleanType, nullable = false)))
  override def run(input: InternalRow): InternalRow = {
    val r = table(input).maintainFromProperties()
    row(r.compacted, r.manifestsFolded, r.expiredSnapshots, r.deletedFiles,
      r.manifestsClustered)
  }
}
