package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join — the canonical time-series lookup
  * ("latest quote at or before each trade") that Spark has no built-in
  * operator for. Composed from existing operators per the
  * compose-first preference: both sides UNION into one frame, one
  * sort-shuffle per key, and a running `last(..., ignoreNulls)` window
  * carries the most recent right-side payload forward to every left row.
  *
  * Scale shape: ONE shuffle (the window's partitionBy on the key), no
  * range-explosion, no per-row probe join — at 100 TB this is strictly
  * a sort-merge pass; the alternative equi-join + filter + max
  * formulation materializes every (left, right-earlier) pair first.
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (`rightTs <= leftTs`), like DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  * With several right rows at the same (key, timestamp) the last in
  * (timestamp, payload-arbitrary) window order wins — callers wanting
  * full determinism should dedup the right side per (key, ts) first.
  */
object AsOfJoin {

  private val T = "__asof_t"
  private val L = "__asof_is_left"

  /** For every `left` row, attach `payloadCols` of the latest `right`
    * row with `right(rightTs) <= left(leftTs)` and equal `keys`
    * (left-outer: unmatched left rows keep null payloads).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val leftOwn = left.columns.toSeq.filterNot(keys.contains)
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"payload columns collide with left columns: ${clash.mkString(", ")}")

    def nullAs(src: DataFrame, c: String): Column =
      lit(null).cast(src.schema(c).dataType).as(c)

    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as(T), lit(1).as(L)) ++
        leftOwn.map(col) ++
        payloadCols.map(nullAs(right, _)): _*)
    val rPart = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as(T), lit(0).as(L)) ++
        leftOwn.map(nullAs(left, _)) ++
        payloadCols.map(col): _*)

    // right rows sort BEFORE left rows at an equal timestamp, so a
    // same-instant right row is visible to the left row (>= semantics)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(T).asc, col(L).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lPart.unionByName(rPart)
      .select(
        (keys ++ leftOwn).map(col) ++
          Seq(col(L)) ++
          payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col(L) === 1)
      .drop(L)
  }
}
