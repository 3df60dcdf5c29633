package graft.tools

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_scan_filter_project", "q_join_agg_revenue", "q_dedup_anti_join",
      "q_agg_pricing_summary", "q_asof_prev_purchase")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = graft.queries.Registry.byName(n).run(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
