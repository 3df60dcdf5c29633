package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's five-rule ingest validator
  * (`run_quality_checks`, `/root/reference/lakehouse_pipeline.py:133-171`),
  * generalized over column names and computed in ONE aggregation pass:
  *
  *   Q1 row count ≥ minRows            (`:136-138`)
  *   Q2 required columns present       (`:140-144`, schema-only, driver)
  *   Q3 null fraction ≤ maxNullFraction per column (`:146-152`)
  *   Q4 time column parseable (not entirely null after cast) (`:154-158`)
  *   Q5 positive columns have min > 0 (nulls ignored)        (`:160-168`)
  *
  * One pass matters at scale: |columns| null counts + mins + counts fold
  * into a single partial-aggregate over one scan instead of a scan per
  * rule.
  */
final case class QcConfig(
    requiredColumns: Seq[String],
    timeColumn: String,
    positiveColumns: Seq[String],
    minRows: Long = 100L,
    maxNullFraction: Double = 0.05
)

/** @param nullTimeKey rows whose time key is null after normalization —
  *   the pipeline must reject these before append: a null key can never be
  *   deduplicated by an equi-anti-join (null != null) and has no partition
  *   or footer stats, so it would silently accumulate duplicates.
  */
final case class QcResult(
    passed: Boolean,
    issues: Seq[String],
    nRows: Long,
    nullTimeKey: Long = 0L)

object QualityChecks {

  private def buildAggs(cols: Seq[String], cfg: QcConfig): Seq[Column] =
    Seq(count(lit(1)).as("__n")) ++
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
      // try_cast, not cast: Spark 4 runs ANSI mode by default, where a
      // plain cast on malformed input fails the whole job — QC must
      // instead COUNT the malformed rows (reference catches the cast
      // error per file, `lakehouse_pipeline.py:154-158`).
      Seq(count(expr(s"try_cast(${cfg.timeColumn} AS TIMESTAMP)")).as("__n_ts")) ++
      cfg.positiveColumns.map(c => min(expr(s"try_cast($c AS DOUBLE)")).as(s"__min_$c"))

  private def resultFromRow(
      row: org.apache.spark.sql.Row, cols: Seq[String], cfg: QcConfig): QcResult = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = row.getAs[Long]("__n")

    if (n < cfg.minRows)
      issues += s"Insufficient rows: $n < ${cfg.minRows}"

    if (n > 0) {
      cols.foreach { c =>
        val frac = row.getAs[Long](s"__nulls_$c").toDouble / n
        if (frac > cfg.maxNullFraction)
          issues += f"Column $c has ${frac * 100}%.1f%% nulls (max ${cfg.maxNullFraction * 100}%.1f%%)"
      }
      if (row.getAs[Long]("__n_ts") == 0L)
        issues += s"Column ${cfg.timeColumn} has no parseable timestamps"
      cfg.positiveColumns.foreach { c =>
        Option(row.getAs[java.lang.Double](s"__min_$c")).foreach { m =>
          if (m <= 0.0) issues += s"Column $c has non-positive values (min=$m)"
        }
      }
    }
    val nullTimeKey =
      if (cols.contains(cfg.timeColumn)) row.getAs[Long](s"__nulls_${cfg.timeColumn}")
      else 0L
    QcResult(issues.isEmpty, issues.toSeq, n, nullTimeKey)
  }

  def run(df: DataFrame, cfg: QcConfig): QcResult = {
    // Q2 — schema-level, no job needed
    val missing = cfg.requiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty) {
      // can't run column-dependent checks on missing columns
      return QcResult(passed = false,
        Seq(s"Missing required columns: ${missing.mkString(", ")}"), nRows = -1L)
    }
    val cols = df.columns.toSeq
    val aggs = buildAggs(cols, cfg)
    resultFromRow(df.agg(aggs.head, aggs.tail: _*).head(), cols, cfg)
  }

  /** Per-file QC for the batched ingest path: the same five rules for
    * EVERY file of a union scan in ONE grouped aggregation pass —
    * |files| × |columns| partial aggregates over a single scan instead
    * of one full QC job per file. Keys of the returned map are the raw
    * `srcCol` values (input_file_name URIs). Assumes the caller already
    * ran the schema-level Q2 check (the union shares one schema).
    */
  def runPerFile(df: DataFrame, srcCol: String, cfg: QcConfig): Map[String, QcResult] = {
    val cols = df.columns.toSeq.filterNot(_ == srcCol)
    val aggs = buildAggs(cols, cfg)
    df.groupBy(col(srcCol)).agg(aggs.head, aggs.tail: _*).collect()
      .map(row => row.getAs[String](srcCol) -> resultFromRow(row, cols, cfg))
      .toMap
  }
}
