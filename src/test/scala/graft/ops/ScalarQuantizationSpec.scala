package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  test("executor encode matches the driver-side quantize on every element") {
    val p = ScalarQuantization.fit(emb, "embedding")
    val rows = ScalarQuantization.encode(emb, "embedding", p)
      .select("vec_id", "embedding", "sq_codes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = r.getAs[collection.Seq[Float]]("embedding")
      val codes = r.getAs[collection.Seq[Long]]("sq_codes")
      assert(codes.length == vec.length)
      vec.indices.foreach { d =>
        val want = ScalarQuantization.quantize(vec(d).toDouble, p.mins(d), p.invs(d))
        assert(codes(d) == want, s"vec ${r.getLong(0)} dim $d: ${codes(d)} != $want")
        assert(codes(d) >= 0L && codes(d) <= 255L)
      }
    }
  }

  test("corpus min/max land on codes 0 and 255; constant dims map to 0") {
    val vs = Seq(
      (1L, Array(0.0f, 7.0f)),
      (2L, Array(10.0f, 7.0f)),
      (3L, Array(5.0f, 7.0f))).toDF("vec_id", "embedding")
    val p = ScalarQuantization.fit(vs, "embedding")
    val codes = ScalarQuantization.encode(vs, "embedding", p)
      .orderBy("vec_id").select("sq_codes").collect()
      .map(_.getAs[collection.Seq[Long]](0))
    assert(codes(0) == Seq(0L, 0L))     // min of dim0; constant dim1 -> 0
    assert(codes(1) == Seq(255L, 0L))   // max of dim0
    assert(codes(2) == Seq(128L, 0L))   // mid rounds half-up
  }

  test("encode is a pure projection: no shuffle in the plan") {
    val p = ScalarQuantization.fit(emb, "embedding")
    val plan = ScalarQuantization.encode(emb, "embedding", p)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("re-ranked search recovers the exact top-5 (recall floor 0.9 measured)") {
    val p = ScalarQuantization.fit(emb, "embedding")
    val encoded = ScalarQuantization.encode(emb, "embedding", p)
    val queries = emb.filter(col("vec_id") < 10).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
      .toSeq
    val got = ScalarQuantization
      .searchRerank(encoded, "vec_id", "embedding", queries, p, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact ground truth by full-precision squared-L2
    val corpus = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val hits = queries.map { case (qid, q) =>
      val exact = corpus.map { case (nid, v) =>
        val d2 = v.indices.foldLeft(0.0)((s, i) => s + (v(i) - q(i)) * (v(i) - q(i)))
        (nid, d2)
      }.sortBy { case (nid, d2) => (d2, nid) }.take(5).map(_._1).toSet
      (got(qid) & exact).size / 5.0
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.9, s"recall@5 $recall below floor (per-query $hits)")
  }

  test("code-space search is exact integer math: repeated runs are identical") {
    val p = ScalarQuantization.fit(emb, "embedding")
    val encoded = ScalarQuantization.encode(emb, "embedding", p)
    val queries = Seq((0L, emb.filter(col("vec_id") === 0)
      .select("embedding").head().getAs[Seq[Float]](0).map(_.toDouble).toArray))
    def run() = ScalarQuantization.search(encoded.repartition(7), "vec_id", queries, p, topK = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val a = run()
    assert(a == run())
    assert(a.head._1 == 0L && a.head._3 == 0L, s"self-match should be distance 0: ${a.head}")
  }
}
