package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregates.
  *
  * The reference engine never needs these — its tables fit one node — but
  * "which keys are hot" is the first question a 100 TB pipeline asks
  * (skew diagnosis before a join, stopword discovery before dedup,
  * abusive-client detection in event streams), and the naive answer
  * (`GROUP BY key ORDER BY count DESC`) shuffles every distinct key.
  * At 10⁹ distinct keys that group-by IS the bottleneck; a bounded
  * mergeable summary shuffles O(partitions × k) instead.
  *
  * [[MisraGries]] is the classic deterministic frequency sketch
  * (Misra & Gries 1982), mergeable with summed error per Agarwal et
  * al., "Mergeable Summaries" (PODS 2012): after ANY merge tree the
  * sketch retains every key whose true frequency exceeds n/(k+1), and
  * each retained estimate undercounts by at most the carried `offset`
  * (≤ n/(k+1)). That guarantee is what makes [[Sketches.heavyHitters]]
  * EXACT: the sketch pass can only over-generate candidates, never miss
  * a true heavy hitter, so the cheap second pass (exact counts of ≤ k
  * candidate keys) returns precisely the keys above threshold — the
  * standard two-pass exact heavy-hitters pattern, with the full
  * group-by replaced by a candidate-only one.
  */
object Sketches {

  /** Misra–Gries buffer: at most k counters plus the total decrement
    * `offset` (the undercount bound). Mutable on purpose — the typed
    * [[Aggregator]] path holds the buffer as a JVM object inside
    * ObjectHashAggregate, so per-row updates are in-place; Kryo only
    * sees it at partial-shuffle boundaries (once per partition).
    */
  final class MgBuffer(
      val counters: mutable.HashMap[String, Long],
      var offset: Long) extends Serializable

  /** Result of the sketch alone: retained keys with their (under-)
    * estimates, plus the shared error bound. `true count ∈
    * [estimate, estimate + offset]` for retained keys; any key NOT
    * retained has true count ≤ offset.
    */
  case class MgSummary(counters: Map[String, Long], offset: Long)

  /** Typed Misra–Gries aggregator over string keys (cast upstream —
    * one canonical key form keeps the sketch and the verify pass
    * agreeing byte-for-byte).
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, MgBuffer, MgSummary] {
    require(k >= 1, s"sketch capacity must be >= 1, got $k")

    override def zero: MgBuffer = new MgBuffer(mutable.HashMap.empty, 0L)

    override def reduce(b: MgBuffer, key: String): MgBuffer = {
      if (key != null) {
        val c = b.counters
        c.get(key) match {
          case Some(v) => c.update(key, v + 1)
          case None if c.size < k => c.update(key, 1L)
          case None =>
            // decrement-all: removes one unit from every counter AND the
            // arriving key — k+1 units per round, so rounds ≤ n/(k+1)
            // and the amortized per-row cost is O(1)
            b.offset += 1
            val dead = c.iterator.collect { case (kk, 1L) => kk }.toList
            dead.foreach(c.remove)
            c.keysIterator.toList.foreach(kk => c.update(kk, c(kk) - 1))
        }
      }
      b
    }

    override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
      val (big, small) = if (b1.counters.size >= b2.counters.size) (b1, b2) else (b2, b1)
      small.counters.foreach { case (kk, v) =>
        big.counters.update(kk, big.counters.getOrElse(kk, 0L) + v)
      }
      big.offset += small.offset
      if (big.counters.size > k) {
        // subtract the (k+1)-th largest count from everything; what
        // remains is exactly the k largest, error grows by that count
        val m = big.counters.values.toArray.sortBy(-_).apply(k)
        big.offset += m
        val dead = big.counters.iterator.collect { case (kk, v) if v <= m => kk }.toList
        dead.foreach(big.counters.remove)
        big.counters.keysIterator.toList.foreach(kk =>
          big.counters.update(kk, big.counters(kk) - m))
      }
      big
    }

    override def finish(b: MgBuffer): MgSummary =
      MgSummary(b.counters.toMap, b.offset)

    override def bufferEncoder: Encoder[MgBuffer] = Encoders.kryo[MgBuffer]
    override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  }

  /** The sketch as an aggregate [[Column]] over a string column. */
  def mgSketch(keyCol: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(keyCol).as("mg_summary")

  /** EXACT heavy hitters: every key of `keyCol` whose count strictly
    * exceeds `floor(phi × n)` (n = row count), as `(key, cnt)` in the
    * column's own type.
    *
    * Two passes, neither of which shuffles raw keys:
    *   1. one Misra–Gries sketch of capacity `k` (default ⌈1/phi⌉, the
    *      smallest guaranteeing no true heavy hitter is missed) — the
    *      shuffle carries one ≤ k-entry summary per partition;
    *   2. exact counts restricted to the ≤ k candidate keys (an InSet
    *      scan predicate — candidate rows are the only ones that reach
    *      the aggregate), filtered by the exact threshold.
    *
    * The result is deterministic and independent of the sketch's merge
    * order: the MG guarantee makes the candidate set a SUPERSET of the
    * true heavy hitters at any k ≥ ⌈1/phi⌉, and pass 2's exact counts
    * discard the extras.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      phi: Double,
      k: Int = 0): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    val cap = if (k > 0) k else math.ceil(1.0 / phi).toInt
    val skCol = mgSketch(col(keyCol).cast("string"), cap)
    val head = df.agg(skCol, count(lit(1)).as("n")).head()
    val summary = head.getAs[org.apache.spark.sql.Row](0)
    val candidates = summary.getAs[Map[String, Long]](0).keys.toSeq
    val n = head.getLong(1)
    val threshold = math.floor(phi * n).toLong
    if (candidates.isEmpty) {
      df.select(col(keyCol)).limit(0).groupBy(keyCol)
        .agg(count(lit(1)).as("cnt"))
    } else {
      // cast the string candidates back to the key's NATIVE type on the
      // driver (a LocalRelation job, no scan) so the verify pass filters
      // with a typed In — pushable to the parquet scan's dictionary /
      // bloom machinery, which `cast(key AS string) IN (…)` is not
      val spark = df.sparkSession
      import spark.implicits._
      val keyType = df.schema(keyCol).dataType
      val typed = candidates.toDF("__c")
        .select(col("__c").cast(keyType)).collect().map(_.get(0))
      df.filter(col(keyCol).isin(typed: _*))
        .groupBy(keyCol)
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > threshold)
    }
  }
}
