package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HdrQuantile]] — integer-exact mergeable quantile histogram: bucket
  * ids are monotone and exact below 2M, estimates stay within the
  * half-bucket relative-error bound, and the map-fold quantile matches
  * a driver-side recompute on arbitrary data.
  */
class HdrQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val M = HdrQuantile.M

  test("bucket ids are monotone in the value and exact below 2M") {
    val vals = ((0L until 2L * M) ++ Seq(128L, 129L, 200L, 1000L, 123456L,
      987654321L, Long.MaxValue / 16)).distinct.sorted
    val df = vals.toDF("v")
      .select(col("v"), HdrQuantile.bucketId(col("v")).as("id"))
      .orderBy("v").collect()
    // exact region: id == value
    df.filter(_.getLong(0) < 2L * M).foreach(r => assert(r.getLong(1) == r.getLong(0)))
    // monotone non-decreasing everywhere
    df.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"ids must be monotone, got $a > $b")
      case _ =>
    }
    // negative values mirror
    val neg = Seq(-1000L, -129L, -5L).toDF("v")
      .select(col("v"), HdrQuantile.bucketId(col("v")).as("id")).collect()
    neg.foreach(r => assert(r.getLong(1) < 0))
  }

  test("estimate stays within the half-bucket relative bound") {
    val vals = Seq(1L, 7L, 127L, 128L, 255L, 300L, 1L << 20, (1L << 40) + 12345L,
      -300L, -(1L << 20))
    val rows = vals.toDF("v")
      .select(col("v"), HdrQuantile.estimate(HdrQuantile.bucketId(col("v"))).as("est"))
      .collect()
    rows.foreach { r =>
      val (v, est) = (r.getLong(0), r.getLong(1))
      val relErr = math.abs(est - v).toDouble / math.max(1L, math.abs(v))
      assert(relErr <= 1.0 / (2 * M) + 1e-12,
        s"estimate $est of $v breaks the ${1.0 / (2 * M)} relative bound ($relErr)")
      assert(math.signum(est.toDouble) == math.signum(v.toDouble) || v == 0)
    }
  }

  test("map-fold quantile matches a driver recompute and merging is count addition") {
    val data = (1 to 500).map(i => (i * i).toLong) // skewed spread
    val m1 = data.take(250)
    val m2 = data.drop(250)
    def histo(vs: Seq[Long]) = vs.toDF("v")
      .groupBy(HdrQuantile.bucketId(col("v")).as("b")).agg(count(lit(1)).as("n"))
      .groupBy().agg(map_from_entries(array_sort(collect_list(struct(col("b"), col("n")))))
        .as("m"))
    val merged = histo(m1).crossJoin(histo(m2).withColumnRenamed("m", "m2"))
      .select(map_zip_with(col("m"), col("m2"),
        (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))).as("m"))
    for (q <- Seq(0.1, 0.5, 0.95, 1.0)) {
      val est = merged.select(HdrQuantile.quantileFromMap(col("m"), q)).head().getLong(0)
      // driver recompute: same rank rule over the exact sorted data
      val rank = math.max(1L, math.ceil(q * data.size).toLong)
      val exact = data.sorted.apply(rank.toInt - 1)
      val relErr = math.abs(est - exact).toDouble / exact
      assert(relErr <= 1.0 / (2 * M) + 1e-12,
        s"q=$q estimate $est vs exact $exact (relErr $relErr)")
    }
  }
}
