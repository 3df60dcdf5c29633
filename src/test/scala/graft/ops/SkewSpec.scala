package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: 90% of rows share one key
  private lazy val big = (0 until 10000)
    .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toDouble))
    .toDF("k", "v")
  private lazy val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("salted join equals plain join") {
    val plain = big.join(small, Seq("k")).select($"k", $"v", $"name")
      .as[(Long, Double, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select($"k", $"v", $"name").as[(Long, Double, String)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val withOrphans = big.union(Seq((999L, -1.0)).toDF("k", "v"))
    val plain = withOrphans.join(small, Seq("k"), "left_outer").count()
    val salted = Skew.saltedJoin(withOrphans, small, Seq("k"), 8, "left_outer").count()
    assert(salted == plain)
  }

  test("salted aggregation equals direct aggregation") {
    val direct = big.groupBy("k").agg(sum($"v").as("sum_v"))
      .as[(Long, Double)].collect().toMap
    val salted = Skew.saltedSum(big, Seq("k"), "v", saltFactor = 8)
      .as[(Long, Double)].collect().toMap
    assert(salted.keySet == direct.keySet)
    // double addition order differs between the two plans: compare with tolerance
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }
}
