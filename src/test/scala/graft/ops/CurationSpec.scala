package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation sampling invariants that the value-level oracles
  * (CurationOps) can't express: the cached-counts overload matches the
  * scanning path exactly, nesting across rates, and the safe direction
  * of a missing count.
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    (0 until 600)
      .map(i => (i.toLong, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
      .cache()
  }

  private val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  test("mixtureSample(counts) reproduces the scanning path exactly") {
    val scanned = Curation.mixtureSample(docs, "doc_id", "source", weights)
    val trueCounts = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cached = Curation.mixtureSample(docs, "doc_id", "source", weights, trueCounts)
    assert(scanned.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      cached.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(cached.count() > 0)
  }

  test("a missing stratum count under-samples, never over-represents") {
    // src2 absent from counts → its n is taken as 0 → K = 0 → empty
    // sample: the mixture can't be met, so nothing is emitted rather
    // than emitting a corpus at the wrong proportions.
    val partial = Curation.mixtureSample(
      docs, "doc_id", "source", weights,
      Map("src0" -> 150L, "src1" -> 150L))
    assert(partial.count() == 0)
  }

  test("hash-gate samples nest across rates") {
    val small = Curation.sampleByHash(docs, "doc_id", "source",
      Map.empty, defaultRate = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Curation.sampleByHash(docs, "doc_id", "source",
      Map.empty, defaultRate = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
    assert(small.nonEmpty && large.size > small.size)
  }
}
