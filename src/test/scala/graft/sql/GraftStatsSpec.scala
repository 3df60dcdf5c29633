package graft.sql

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** DSv2 `SupportsReportStatistics` (round 18): the catalog read path
  * reports EXACT table statistics from one cached manifest-list read —
  * size from the per-manifest byte roll-ups, row count from the row
  * inventory, per-column null/distinct/min-max for CBO. Spark consults
  * the interface at the RELATION level (`analyzed.stats` builds a
  * fresh scan); after pushdown the upstream `V1ScanWrapper` does not
  * forward it, so the broadcast-join pin below runs on the engine's
  * recommended path — the extension rule's native splice, whose
  * parquet relations carry real file sizes.
  */
class GraftStatsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"gstat$n"
    val wh = tmpDir("gstat-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
    (cat, wh)
  }

  private def ts(i: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:00:${i / 60}%02d.${(i % 60) * 1000}%06d")

  test("DSv2 relation stats are the manifest truth: bytes, rows, column stats") {
    val (cat, wh) = freshCatalog()
    val data = (0 until 50)
      .map(i => (ts(i), (100 + i % 13).toLong, if (i % 5 == 0) None else Some(i.toLong)))
      .toDF("ts", "uid", "opt")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/t1"), data.schema, Some("ts"))
    t.setProperty("write.stats-columns", "uid,opt")
    t.setProperty("write.ndv-columns", "uid")
    (0 until 2).foreach(r => t.append(data.filter(col("uid") % 2 === r)))
    withSqlConf("spark.graft.sql.expansion-enabled" -> "false") {
      val stats = spark.table(s"$cat.gold.t1")
        .queryExecution.analyzed.stats
      val expectBytes = t.currentDataFiles.flatMap(_.bytes).sum
      assert(t.currentDataFiles.forall(_.bytes.isDefined))
      assert(stats.sizeInBytes == BigInt(expectBytes),
        s"sizeInBytes ${stats.sizeInBytes} != recorded $expectBytes")
      // rowCount + attribute stats survive only the CBO stats visitor
      // (the size-only visitor deliberately strips them); attribute
      // stats are read at the RELATION leaf — the surface the
      // connector owns (alias hops above re-key attribute maps)
      withSqlConf("spark.sql.cbo.enabled" -> "true") {
        val cboStats = spark.table(s"$cat.gold.t1")
          .queryExecution.analyzed.collectLeaves().head.stats
        assert(cboStats.rowCount.contains(BigInt(50)),
          s"rowCount ${cboStats.rowCount} != 50")
        val uidStat = cboStats.attributeStats.find(_._1.name == "uid").map(_._2)
        assert(uidStat.exists(_.distinctCount.contains(BigInt(13))),
          s"uid distinctCount from the ndv sketch: $uidStat")
        assert(uidStat.exists(_.min.contains(100L)) &&
          uidStat.exists(_.max.contains(112L)), s"uid min/max: $uidStat")
        val optStat = cboStats.attributeStats.find(_._1.name == "opt").map(_._2)
        assert(optStat.exists(_.nullCount.contains(BigInt(10))),
          s"opt nullCount from the null roll-ups: $optStat")
      }
    }
  }

  test("a KB-scale graft dimension broadcasts against a graft fact table (expansion path)") {
    val (cat, wh) = freshCatalog()
    val fact = (0 until 5000)
      .map(i => (ts(i % 3000), (i % 40).toLong, i.toDouble))
      .toDF("ts", "uid", "v")
    val dim = (0 until 40).map(i => (ts(i), i.toLong, s"name$i")).toDF("ts", "uid", "name")
    val tf = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/fact"), fact.schema, Some("ts"))
    tf.append(fact)
    val td = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/dim"), dim.schema, Some("ts"))
    td.append(dim)
    withSqlConf("spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table(s"$cat.gold.fact")
        .join(spark.table(s"$cat.gold.dim"), "uid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"KB-scale dim must broadcast on the expansion path, plan was:\n$plan")
      assert(joined.count() == 5000L)
    }
  }

  test("live MoR masks drop the row count but keep the size; empty table reads zero") {
    val (cat, wh) = freshCatalog()
    val data = (0 until 30).map(i => (ts(i), i.toLong)).toDF("ts", "uid")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/t3"), data.schema, Some("ts"))
    withSqlConf("spark.graft.sql.expansion-enabled" -> "false",
      "spark.sql.cbo.enabled" -> "true") {
      val empty = spark.table(s"$cat.gold.t3")
        .queryExecution.analyzed.collectLeaves().head.stats
      assert(empty.sizeInBytes <= BigInt(1) && empty.rowCount.contains(BigInt(0)))
      t.append(data)
      t.morDeleteKeys(Seq(3L).toDF("uid"), "uid")
      val masked = spark.table(s"$cat.gold.t3")
        .queryExecution.analyzed.collectLeaves().head.stats
      assert(masked.rowCount.isEmpty,
        "a mask makes the inventory an overstatement — rowCount must drop")
      assert(masked.sizeInBytes == BigInt(t.currentDataFiles.flatMap(_.bytes).sum),
        "bytes still serve under a mask (reads still open those files)")
    }
  }

  test("the byte roll-up rides the manifest list, so stats never parse manifests") {
    val (cat, wh) = freshCatalog()
    val data = (0 until 10).map(i => (ts(i), i.toLong)).toDF("ts", "uid")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(wh, "gold/t4"), data.schema, Some("ts"))
    t.append(data)
    withSqlConf("spark.graft.sql.expansion-enabled" -> "false") {
      val sized = spark.table(s"$cat.gold.t4").queryExecution.analyzed.stats
      assert(sized.sizeInBytes < BigInt(Long.MaxValue) / 2)
      // manifests carry the byte roll-up ⇔ every member is sized
      assert(t.metadata.currentSnapshot.exists(s =>
        t.log.readManifestListData(s).manifests.forall(_.dataBytes.isDefined)))
    }
  }
}
