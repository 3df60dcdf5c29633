package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs with equal keys whose time values lie within
  * `delta` of each other — Spark has no native range-join operator, and
  * the naive formulation (equi-join on the key + band filter) still
  * materializes every same-key pair first.
  *
  * The scalable shape used here is bucketization: quantize time into
  * `delta`-wide buckets; a pair within `delta` must land in the same or
  * adjacent buckets, so replicating ONE side into its bucket ±1 turns
  * the band predicate into an equality join on (key, bucket) — the only
  * shuffle — followed by the exact band filter. Candidate pairs are
  * bounded by bucket co-residency (≈ data density × delta), never by
  * |key group|²; 3× replication of one side is the total overhead.
  */
object RangeJoin {

  private val B = "__band_bucket"

  /** Pairs `(left, right)` with equal `keys` and
    * `|left(leftTs) - right(rightTs)| <= delta` (time columns must be
    * numeric, e.g. epoch micros). Column sets of the two frames must be
    * disjoint apart from `keys`.
    */
  def band(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    def bucket(t: Column): Column = floor(t / lit(delta)).cast("long")
    // left replicated into its bucket and both neighbors; right keeps its
    // own bucket — every qualifying pair meets in exactly one bucket cell
    val l = left
      .withColumn(B, explode(array(Seq(-1, 0, 1).map(o => bucket(col(leftTs)) + o): _*)))
    val r = right.withColumn(B, bucket(col(rightTs)))
    l.join(r, keys :+ B)
      .filter(abs(col(leftTs) - col(rightTs)) <= delta)
      .drop(B)
  }
}
