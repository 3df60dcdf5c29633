package graft.functions

import graft.SparkSpec
import graft.ops.{DedupOps, SimilaritySearch}
import org.apache.spark.sql.functions._

/** The SQL surface must agree exactly with the Column API for every
  * registered native/portable function.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API bit-for-bit") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), "abc"), (Array(0.5f, -1.0f, 4.0f), "hello world"))
      .toDF("vec", "s").createOrReplaceTempView("graft_fn_probe")

    val viaSql = spark.sql(
      """SELECT dot_product(vec, vec) AS d,
        |       lsh_buckets(vec, 4, 2, 3) AS b,
        |       poly_hash(s) AS h
        |FROM graft_fn_probe""".stripMargin)
      .as[(Double, Seq[Long], Long)].collect().toSeq

    val viaColumns = spark.table("graft_fn_probe")
      .select(
        SimilaritySearch.dot(col("vec"), col("vec")).as("d"),
        SimilaritySearch.lshTableBuckets(col("vec"), 4, 2, 3).as("b"),
        DedupOps.polyHash(col("s")).as("h"))
      .as[(Double, Seq[Long], Long)].collect().toSeq

    assert(viaSql === viaColumns)
    assert(viaSql.map(_._3) === Seq(96354L, 204910434L)) // pinned constants
  }
}
