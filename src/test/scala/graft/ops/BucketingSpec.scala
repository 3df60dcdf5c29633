package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // bucketed joins must not be auto-broadcast or the exchange check is
    // vacuous; also disable AQE's coalescing for a stable plan string
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500 + 1, i.toLong)).toDF("k", "v")
      val dims = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "graft_bucketed_facts", Seq("k"), 8)
      Bucketing.writeBucketed(dims, "graft_bucketed_dims", Seq("k"), 8)

      val joined = Bucketing.table(spark, "graft_bucketed_facts")
        .join(Bucketing.table(spark, "graft_bucketed_dims"), Seq("k"))
      assert(Bucketing.isShuffleFree(joined),
        s"expected exchange-free plan:\n${joined.queryExecution.executedPlan}")

      // and the result is still the plain join's result
      assert(joined.count() === 10000L)
      val sums = joined.groupBy("name").agg(sum($"v").as("s"))
      assert(sums.count() === 500L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 5000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
      Bucketing.writeBucketed(facts, "graft_bucketed_agg", Seq("k"), 4)
      val agg = Bucketing.table(spark, "graft_bucketed_agg")
        .groupBy("k").agg(sum($"v").as("s"))
      assert(Bucketing.isShuffleFree(agg),
        s"expected exchange-free plan:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() === 100L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_agg")
    }
  }
}
