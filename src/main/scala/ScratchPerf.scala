import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextAnalysis}

object ScratchPerf {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("scratch")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    time("shingles-direct") {
      docs.select(explode(DedupOps.shingles($"text")).as("g")).count()
    }
    time("shingles-two-step") {
      docs.select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
        .select($"doc_id", explode(array_distinct(transform(
          sequence(lit(1), greatest(size($"toks") - 2, lit(0))),
          i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1), element_at($"toks", i + 2))))).as("g"))
        .count()
    }
    time("tokens-only") {
      docs.select(explode(TextAnalysis.tokens($"text")).as("t")).count()
    }
    time("split-only") {
      docs.select(explode(split($"text", " ")).as("t")).count()
    }
    spark.stop()
  }
}
