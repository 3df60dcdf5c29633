package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Z-order (Morton) clustering for multi-column file skipping — the
  * layout half of Delta/Iceberg's OPTIMIZE ZORDER BY. A single-column
  * sort gives tight file ranges on ONE key; interleaving the bits of
  * several keys gives every key locality that degrades gracefully
  * (each column contributes its high bits first), so per-file min/max
  * footer bounds stay narrow on ALL z-columns and a predicate on any of
  * them skips most files. Everything here is `functions._` composition
  * — shiftleft/and/or fold inside whole-stage codegen, no UDF.
  *
  * Scaling is linear min→max per column (one tiny agg pass computes the
  * bounds). Heavy skew compresses a column's effective resolution —
  * the classic caveat vs rank-based scaling, accepted for the same
  * reason the engines above accept it: rank scaling needs a global sort
  * per column before the rewrite even starts.
  */
object ZOrder {

  /** Bits of resolution per column; n·bits must stay < 63 so the
    * z-value fits a non-negative long (2 columns → 16 bits each by
    * default; more columns trade per-column resolution automatically).
    */
  def bitsFor(nCols: Int): Int = math.min(16, 62 / math.max(1, nCols))

  /** Long-comparable representation a column is scaled from: epoch
    * micros for timestamps, plain double for every numeric (exact for
    * ints/longs; layout-only, so double rounding at the 2^53 edge is
    * harmless).
    */
  def rep(c: Column, dt: DataType): Column = dt match {
    // NTZ first casts to TIMESTAMP (session tz, UTC across graft) —
    // unix_micros itself rejects TIMESTAMP_NTZ input
    case TimestampType | TimestampNTZType =>
      unix_micros(c.cast(TimestampType)).cast("double")
    case _ => c.cast("double")
  }

  /** Scale `repCol` from [minV, maxV] into an integer cell in
    * [0, 2^bits); out-of-range and null values clamp to the edges (a
    * null sorts first — it has no better home in a z-curve).
    */
  def cell(repCol: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val range = math.max(maxV - minV, java.lang.Double.MIN_VALUE)
    val maxCell = (1L << bits) - 1
    least(lit(maxCell), greatest(lit(0L),
      coalesce((repCol - minV) / range * maxCell, lit(0.0)).cast("long")))
  }

  /** Interleave the bits of pre-scaled cells (each in [0, 2^bits)):
    * bit b of column i lands at position b·n + i, so all columns'
    * high-order bits dominate the ordering together — the Morton curve.
    */
  def interleave(cells: Seq[Column], bits: Int): Column = {
    require(cells.nonEmpty, "z-order needs at least one column")
    require(cells.size * bits <= 62, s"${cells.size} cols x $bits bits overflows a long")
    val n = cells.size
    val parts =
      for { b <- 0 until bits; (c, i) <- cells.zipWithIndex }
        yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    parts.reduce(_ bitwiseOR _)
  }

  /** The composed z-value for columns with known bounds. */
  def zValue(colsWithBounds: Seq[(Column, DataType, Double, Double)]): Column = {
    val bits = bitsFor(colsWithBounds.size)
    interleave(
      colsWithBounds.map { case (c, dt, lo, hi) => cell(rep(c, dt), lo, hi, bits) },
      bits)
  }
}
