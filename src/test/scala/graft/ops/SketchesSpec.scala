package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: key i contributes ceil(3000 / i) rows — 400 distinct keys,
  // a handful of genuinely heavy ones, a long near-uniform tail
  private def zipf = {
    val rows = for {
      i <- 1 to 400
      _ <- 1 to math.ceil(3000.0 / i).toInt
    } yield s"key$i"
    rows.toDF("k").repartition(16)
  }

  test("heavyHitters equals the exact group-by answer on skewed data") {
    val df = zipf
    val n = df.count()
    val phi = 0.01
    val threshold = math.floor(phi * n).toLong
    val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sketches.heavyHitters(df, "k", phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.size < 400, s"fixture degenerate: ${exact.size}")
    assert(got == exact)
  }

  test("a tight capacity (k = ceil(1/phi)) still misses no true heavy hitter") {
    val df = zipf
    val got = Sketches.heavyHitters(df, "k", 0.05, k = 20)
    val n = df.count()
    val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > math.floor(0.05 * n).toLong)
      .collect().map(_.getString(0)).toSet
    assert(got.collect().map(_.getString(0)).toSet == exact)
  }

  test("sketch contract: bounded size, undercounting estimates within offset") {
    val df = zipf
    val k = 32
    val row = df.agg(Sketches.mgSketch(col("k"), k)).head()
      .getAs[org.apache.spark.sql.Row](0)
    val counters = row.getAs[Map[String, Long]](0)
    val offset = row.getLong(1)
    val n = df.count()
    assert(counters.size <= k)
    assert(offset <= n / (k + 1) + 1,
      s"merged error $offset exceeds the mergeable-summaries bound ${n / (k + 1)}")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counters.foreach { case (key, est) =>
      val t = exact(key)
      assert(est <= t && t <= est + offset,
        s"$key: est $est not in [true-offset, true] (true $t, offset $offset)")
    }
    // completeness: every key with true count > n/(k+1) is retained
    exact.filter(_._2 > n / (k + 1)).keys.foreach(key =>
      assert(counters.contains(key), s"guaranteed-heavy $key evicted"))
  }

  test("raw keys never shuffle: the sketch pass plans as ObjectHashAggregate") {
    val q = zipf.agg(Sketches.mgSketch(col("k"), 16))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("on a parquet source the verify pass result matches exact, and its typed In predicate is pushable") {
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val phi = 0.01
    val n = ev.count()
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > math.floor(phi * n).toLong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Sketches.heavyHitters(ev, "user_id", phi)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact && got.nonEmpty)
    // the design decision heavyHitters relies on: a typed In on the
    // native column reaches the scan as a pushed filter (a
    // cast-to-string comparison would not)
    val plan = ev.filter(col("user_id").isin(1L, 2L, 3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(user_id"), plan)
  }

  test("non-string keys verify against their native type; empty frame yields empty result") {
    val longs = (1 to 100).flatMap(i => Seq.fill(if (i <= 3) 30 else 1)(i.toLong))
      .toDF("id")
    val hh = Sketches.heavyHitters(longs, "id", 0.05)
    val got = hh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 30L, 2L -> 30L, 3L -> 30L))
    assert(hh.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(Sketches.heavyHitters(longs.limit(0), "id", 0.05).collect().isEmpty)
  }
}
