package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table support — the co-located join path.
  *
  * A join between two tables bucketed by the join key into the same
  * bucket count needs NO exchange at query time: every bucket pair is
  * joined map-side. At 100 TB this converts the nightly fact⋈fact join
  * from the dominant shuffle (terabytes over the wire, re-done per
  * query) into a one-time write-side cost that every subsequent join
  * amortizes — the same trade Iceberg's bucket partition transform and
  * Hive's CLUSTERED BY make.
  *
  * Spark requires bucketed data to live in a catalog table
  * (`saveAsTable`); with the default in-memory catalog + local
  * warehouse dir that is still plain parquet on disk plus bucket
  * metadata, so it fits the engine's files-first layout.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (overwriting any previous
    * one), bucketed AND sorted by `keys` into `numBuckets` buckets —
    * sorted buckets additionally let sort-merge joins skip their sort.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      keys: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins buy. (BroadcastExchange is
    * not a shuffle and doesn't count against it.)
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
