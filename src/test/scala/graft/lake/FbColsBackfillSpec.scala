package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** fbCols backfill on manifest rewrite (round 14, VERDICT r13 #5):
  * manifest entries from pre-r13 commits carry no footer-bloom
  * presence proof, so every point lookup pays a speculative footer
  * open per such file forever. `rewriteManifests` already rewrites
  * their metadata — it now stamps the proof (one bounded-pool footer
  * read per unstamped entry, paid once), after which point planning
  * answers from the manifest alone.
  */
class FbColsBackfillSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: org.json4s.Formats = DefaultFormats

  private def residue(r: Int, n: Int = 40) =
    (0 until n).map { i =>
      val u = 4 * i + r
      (Timestamp.valueOf(f"2024-01-01 00:00:00.$u%06d"), u.toDouble)
    }.toDF("ts", "value").coalesce(1)

  private def usOf(micro: Int) =
    Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L + micro

  /** Strip fbCols from every manifest of the current snapshot —
    * simulates pre-r13 metadata (the field is additive, so the
    * stripped JSON is exactly what an r12 writer produced).
    */
  private def stripFbCols(t: LakehouseTable): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = t.tableDir.getFileSystem(conf)
    val log = new SnapshotLog(t.tableDir, conf)
    t.metadata.currentSnapshot.foreach { snap =>
      log.readManifestList(snap).foreach { ref =>
        val p = new Path(t.tableDir, ref.path)
        val in = fs.open(p)
        val data =
          try Serialization.read[ManifestData](
            new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
          finally in.close()
        val stripped = data.copy(files = data.files.map(_.copy(fbCols = None)))
        val out = fs.create(p, true)
        try out.write(Serialization.writePretty(stripped).getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    SnapshotLog.clearPlanningCache()
  }

  test("rewriteManifests stamps footer-bloom presence on unstamped entries") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("fbc"), "t"), residue(0).schema, Some("ts"))
    (0 until 3).foreach(r => t.append(residue(r)))
    // native writes stamp the proof (the key column carries a footer
    // bloom in every row group)
    assert(t.currentDataFiles.forall(_.fbCols.exists(_.contains("ts"))))
    stripFbCols(t)
    assert(t.currentDataFiles.forall(_.fbCols.isEmpty),
      "fixture: stripped manifests must read as pre-r13 entries")
    t.rewriteManifests()
    val stamped = t.currentDataFiles
    assert(stamped.forall(_.fbCols.isDefined),
      "rewrite must backfill the presence proof on every carried entry")
    assert(stamped.forall(_.fbCols.exists(_.contains("ts"))),
      "the backfilled proof must list the key column's footer bloom")
    // and the rewritten table still answers point lookups exactly
    val keys = Seq(usOf(1), usOf(5), usOf(9))
    val got = t.readPoints(keys).select(unix_micros(col("ts"))).as[Long]
      .collect().sorted.toSeq
    assert(got == keys.sorted)
  }

  test("already-stamped tables rewrite without touching footers") {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("fbc2"), "t"), residue(0).schema, Some("ts"))
    (0 until 2).foreach(r => t.append(residue(r)))
    val before = t.currentDataFiles.map(f => f.path -> f.fbCols).toMap
    t.rewriteManifests()
    val after = t.currentDataFiles.map(f => f.path -> f.fbCols).toMap
    assert(after == before, "stamped entries must carry over unchanged")
  }
}
