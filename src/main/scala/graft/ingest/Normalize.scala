package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type normalization on ingest — the reference's `normalize_arrow_types`
  * (`/root/reference/lakehouse_pipeline.py:176-199`): the time column is
  * coerced to µs-precision timestamps and narrow floats are widened to
  * double. Unlike the reference (which maps every non-timestamp column to
  * double, destroying strings — SURVEY.md §7.5 item 3), non-numeric
  * columns keep a faithful type mapping.
  *
  * All casts are single-pass projections over the scan — codegen'd, no
  * shuffle, no UDFs.
  */
object Normalize {

  def apply(df: DataFrame, timeColumn: String): DataFrame = {
    val widened = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case FloatType => d.withColumn(f.name, col(f.name).cast(DoubleType))
        case _ => d
      }
    }
    if (!widened.columns.contains(timeColumn)) widened
    else widened.schema(timeColumn).dataType match {
      case TimestampType => widened
      case StringType =>
        // try_cast: malformed strings become null and are then caught by
        // QualityChecks Q4, instead of failing the job under ANSI mode
        widened.withColumn(timeColumn, expr(s"try_cast($timeColumn AS TIMESTAMP)"))
      case TimestampNTZType | DateType =>
        widened.withColumn(timeColumn, col(timeColumn).cast(TimestampType))
      case LongType =>
        // long time columns are epoch nanos in our inputs (parquet
        // TIMESTAMP(NANOS) read under nanosAsLong; see graft.Tables.t);
        // floor-truncate to µs exactly like DuckDB's epoch_us.
        widened.withColumn(timeColumn, timestamp_micros(expr(s"$timeColumn div 1000")))
      case _ => widened
    }
  }
}
