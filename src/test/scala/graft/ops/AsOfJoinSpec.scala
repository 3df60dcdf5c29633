package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, ts, label)
    ("a", 10L, "a10"),
    ("a", 20L, "a20"),
    ("a", 30L, "a30"),
    ("b", 15L, "b15"),
    ("c", 5L, "c5") // key with no right rows at all
  ).toDF("k", "t", "label")

  private def rightDf = Seq(
    // (key, ts, payload)
    ("a", 5L, 100L),
    ("a", 20L, 200L), // exactly at a20 — must match (>= semantics)
    ("a", 25L, 300L),
    ("b", 99L, 400L) // after every b left row — must not match
  ).toDF("k", "rt", "p")

  test("backward as-of picks the latest right row at or before each left row") {
    val out = AsOfJoin
      .backward(leftDf, rightDf, Seq("k"), "t", "rt", Seq("p"))
      .select("label", "p")
      .as[(String, Option[Long])]
      .collect()
      .toMap
    assert(out === Map(
      "a10" -> Some(100L), // 5 <= 10 < 20
      "a20" -> Some(200L), // tie: right row at 20 wins
      "a30" -> Some(300L), // latest of {5,20,25}
      "b15" -> None, // only right row is later
      "c5" -> None // no right rows for key
    ))
  }

  test("left rows and columns are preserved exactly (left-outer shape)") {
    val out = AsOfJoin.backward(leftDf, rightDf, Seq("k"), "t", "rt", Seq("p"))
    assert(out.count() === leftDf.count())
    assert(out.columns.toSet === Set("k", "t", "label", "p"))
  }

  test("payload name collisions with left columns are rejected") {
    val clashing = rightDf.withColumnRenamed("p", "label")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(leftDf, clashing, Seq("k"), "t", "rt", Seq("label"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("matches the equi-join + max formulation on a bigger random-ish frame") {
    // reference semantics via the O(pairs) formulation
    val left = (1 to 200).map(i => ("k" + i % 7, i.toLong * 3 % 101, i)).toDF("k", "t", "lid")
    val right = (1 to 150).map(i => ("k" + i % 5, i.toLong * 7 % 97, i.toLong)).toDF("k", "rt", "p")
      .dropDuplicates("k", "rt") // unique (key, ts) — see tie caveat in scaladoc
    val viaWindow = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("p"))
      .select("lid", "p").as[(Int, Option[Long])].collect().toMap
    val best = left.join(right, Seq("k")).filter($"rt" <= $"t")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy($"rt".desc, $"p".desc)))
      .filter($"rnk" === 1)
      .select("lid", "p").as[(Int, Long)].collect().toMap
    left.select("lid").as[Int].collect().foreach { lid =>
      assert(viaWindow(lid) === best.get(lid), s"lid=$lid")
    }
  }
}
