package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Integer-exact HDR-histogram quantile sketch (the HdrHistogram
  * bucketing scheme: power-of-two exponent ranges, each split into
  * `M = 2^SubBucketBits` linear sub-buckets) over 1e-4-scaled longs.
  *
  * Why THIS sketch and not t-digest/KLL for the rollup: those are
  * merge-order dependent (the same multiset yields different centroids
  * under different shuffle orders), which breaks both the engine's
  * determinism discipline and any value-level oracle. The HDR bucket id
  * is a PURE integer function of the value, the sketch (a bucket→count
  * map) is a pure function of the multiset, merging is key-wise count
  * addition (commutative monoid), and the quantile estimate is exact
  * integer algebra — DuckDB replays every step bit-identically. The
  * price is a fixed relative-error bound instead of an adaptive one:
  * estimates are bucket midpoints, so the error is at most half a
  * bucket width ≈ 2^-(SubBucketBits+1) ≈ 0.8% of the value — the same
  * guarantee class as DDSketch, with none of the floating-point
  * boundary hazards (bucketing uses `bin()` length and integer shifts,
  * never `log`).
  *
  * Layout of the unsigned id for a scaled value `a ≥ 0`:
  *   - `a < 2M`: id = a (these values are EXACT — width-1 buckets);
  *   - else, with `e = floor(log2 a)` (computed as `length(bin(a))-1`)
  *     and `frac` = the `SubBucketBits` bits below the leading bit:
  *     id = (e - SubBucketBits)*M + M + frac — contiguous with the
  *     exact range at a = 2M, monotone in `a`.
  * Signed values mirror: id(v) = sign(v) * id(|v|), so ascending id
  * order IS ascending value order and one sorted walk answers any
  * quantile.
  */
object HdrQuantile {

  /** Sub-bucket bits: 6 → 64 linear sub-buckets per octave, ≤ ~0.8%
    * relative error on estimates.
    */
  val SubBucketBits = 6
  val M: Int = 1 << SubBucketBits

  /** Signed bucket id of a 1e-4-scaled LONG column — exact integer
    * algebra only (`bin()` length for the exponent, `shiftright` +
    * mask for the sub-bucket), reproducible verbatim in DuckDB.
    */
  def bucketId(scaled: Column): Column = {
    val a = abs(scaled)
    val e = (length(bin(a)) - 1).cast(LongType)
    val frac = call_function("shiftright", a,
      greatest(e - SubBucketBits, lit(0L)).cast("int")) % M
    val unsignedId = when(a < 2 * M, a)
      .otherwise((e - SubBucketBits) * M + M + frac)
    when(scaled.isNull, lit(null).cast(LongType))
      .when(scaled < 0, -unsignedId)
      .otherwise(unsignedId)
  }

  /** Midpoint estimate (1e-4-scaled long) of a signed bucket id. All
    * arithmetic stays exact: `(M + frac) * 2^k + 2^(k-1)` carries at
    * most SubBucketBits+2 significant bits, so the double `pow` path is
    * integer-exact up to the full long range.
    */
  def estimate(id: Column): Column = {
    val a = abs(id)
    val k = floor((a - M) / M).cast(LongType) // e - SubBucketBits
    val frac = a - M - k * M
    val mid = (pow(lit(2.0), k.cast("double")) * (frac + M) +
      pow(lit(2.0), (k - 1).cast("double"))).cast(LongType)
    val unsignedVal = when(a < 2 * M, a).otherwise(mid)
    when(id.isNull, lit(null).cast(LongType))
      .when(id < 0, -unsignedVal)
      .otherwise(unsignedVal)
  }

  /** The q-quantile estimate (1e-4-scaled long) out of a bucket→count
    * map: one fold over the id-sorted entries — a pure projection, no
    * shuffle, null map → null. Rank semantics: the smallest bucket
    * whose cumulative count reaches `ceil(q * total)` (floored at 1).
    */
  def quantileFromMap(m: Column, q: Double): Column = {
    val entries = array_sort(map_entries(m)) // struct sort: key asc = value asc
    val total = aggregate(entries, lit(0L), (acc, e) => acc + e.getField("value"))
    val rank = greatest(ceil(lit(q) * total).cast(LongType), lit(1L))
    val pick = aggregate(
      entries,
      struct(lit(0L).as("cum"), lit(null).cast(LongType).as("id")),
      (acc, e) => {
        val cum = acc.getField("cum") + e.getField("value")
        struct(
          cum.as("cum"),
          when(acc.getField("id").isNotNull, acc.getField("id"))
            .when(cum >= rank, e.getField("key"))
            .as("id"))
      })
    estimate(pick.getField("id"))
  }
}
