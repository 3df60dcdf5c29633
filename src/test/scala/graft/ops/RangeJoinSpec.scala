package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals the naive band-filtered join") {
    val left = (1 to 300).map(i => ("k" + i % 5, i.toLong * 13 % 500, i)).toDF("k", "lt", "lid")
    val right = (1 to 200).map(i => ("k" + i % 7, i.toLong * 29 % 500, i)).toDF("k", "rt", "rid")
    val delta = 37L

    val banded = RangeJoin.band(left, right, Seq("k"), "lt", "rt", delta)
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    val naive = left.join(right, Seq("k"))
      .filter(abs($"lt" - $"rt") <= delta)
      .select("lid", "rid").as[(Int, Int)].collect().toSet

    assert(banded === naive)
    assert(naive.nonEmpty) // the fixture must actually exercise the band
  }

  test("bucket-boundary pairs are found exactly once (no dup from replication)") {
    // pairs straddling a bucket edge: delta=10, times 9 and 11 (buckets 0,1)
    val left = Seq(("k", 9L, 1)).toDF("k", "lt", "lid")
    val right = Seq(("k", 11L, 2), ("k", 20L, 3), ("k", 19L, 4)).toDF("k", "rt", "rid")
    val out = RangeJoin.band(left, right, Seq("k"), "lt", "rt", 10L)
      .select("lid", "rid").as[(Int, Int)].collect().toSeq
    // 9→11 (gap 2) and 9→19 (gap 10, inclusive) match; 9→20 (gap 11) doesn't
    assert(out.sorted === Seq((1, 2), (1, 4)))
  }
}
