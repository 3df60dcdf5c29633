package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for joins whose key distribution is heavy-tailed —
  * the manual complement to AQE's runtime skew-join splitting (which
  * handles sort-merge shuffles but not every shape, e.g. pre-AQE plans
  * or aggregations keyed on a hot value).
  *
  * Salting: the skewed (big) side gets a random-ish salt derived from a
  * row hash, spreading one hot key over `saltFactor` shuffle partitions;
  * the other side is replicated `saltFactor` times so every salted key
  * still finds its match. Correctness is join-equivalence (verified in
  * SkewSpec); cost is `saltFactor`× replication of the small side —
  * which is why the small side must be the replicated one.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Join types for which replicating the small side is correct: every
    * replicated small row either matches (and joins exactly once per big
    * row, same as unsalted) or is dropped. right/full outer would instead
    * emit each unmatched small row `saltFactor` times — rejected.
    */
  private val SaltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Equi-join `big ⋈ small` on `keys`, salted `saltFactor` ways.
    * The salt is derived deterministically from the big side's full row
    * hash (monotonically_increasing_id would break retry idempotence on
    * a real cluster; a content hash re-salts identically on task retry).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(
      SaltableJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows saltFactor times)")
    val saltedBig = big.withColumn(
      SaltCol, pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicatedSmall = small.withColumn(
      SaltCol, explode(array((0 until saltFactor).map(i => lit(i)): _*)))
    saltedBig
      .join(replicatedSmall, keys :+ SaltCol, joinType)
      .drop(SaltCol)
  }

  /** Two-phase (partial → final) aggregation for a hot grouping key:
    * group by (key, salt) first so the hot key's rows combine in
    * parallel, then re-aggregate by key. `aggs` must be decomposable
    * (sum/count/min/max — the partial and final functions coincide).
    */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      sumCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn(
      SaltCol, pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(sumCol)).as(sumCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCol)).as(s"sum_$sumCol"))
  }
}
