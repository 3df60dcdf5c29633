package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Conventions that keep the driver's hash-compare honest (it sorts columns
  * by name, so names must match exactly; we additionally emit a total ORDER
  * BY on both sides so row order can never matter):
  *   - every integer-ish output column is BIGINT on both sides;
  *   - doubles read straight from parquet are emitted untouched (bit-equal
  *     on both engines since no arithmetic happens);
  *   - SUMs over non-integral doubles are summed as unscaled 1e-4 LONGs
  *     (`sum(round(c*10000)::long)/10000.0`) — integer addition is exact,
  *     so partial-aggregation order cannot change the result the way
  *     double addition can, and the sum stays on the codegen fast path
  *     (the DuckDB oracle keeps the equivalent DECIMAL(18,4) form; both
  *     round HALF_UP and inputs carry ≤4 decimal places, so the two are
  *     bit-identical — see Relational.decSumD for the overflow bound);
  *   - derived doubles (ratios, cosines) are round(x, 4) on both sides with
  *     the arithmetic written in the same operation order;
  *   - timestamps are emitted as epoch micros/millis BIGINT (testdata
  *     `events.ts` is timestamp[ns], which Spark truncates to micros on
  *     read while DuckDB keeps ns — raw timestamp outputs would mismatch).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries worth timing at sf0.1 in Bench */
    bench: Boolean = false
)
