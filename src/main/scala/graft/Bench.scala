package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the headline (bench-flagged) queries at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the noop sink — unlike `count()`,
  * this executes the full projection (count() lets Catalyst skip column
  * evaluation entirely for scan-shaped plans, which would bench the
  * metadata, not the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val specs = queries.Registry.all.filter(_.bench)
    // one warmup pass on the smallest known SF primes codegen + JIT so
    // the timed numbers measure the queries, not classloading
    specs.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // a failed query reports null (not its near-zero abort time) and is
    // excluded from the total, so a regression can never read as a speedup;
    // each query is timed twice and the minimum reported — single-shot
    // numbers on a shared box carry 20-50% scheduler noise
    def timeOnce(q: queries.QuerySpec): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          None
      }
    }
    val results: Seq[(String, Option[Double])] = specs.map { q =>
      val best = (timeOnce(q), timeOnce(q)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case _ => None // any failure -> null
      }
      q.name -> best
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(x => f"$x%.3f").getOrElse("null") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
