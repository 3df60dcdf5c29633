package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Partition-spec evolution: [[LakehouseTable.evolvePartitionSpec]] is
  * a metadata-only commit; files keep their epoch's layout and readers
  * plan each epoch with its own dirs while exposing the NEW spec's
  * derived columns uniformly.
  */
class SpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def usOf(s: String): Long =
    Timestamp.valueOf(s).toInstant.toEpochMilli * 1000L

  private def rows(mmdd: Seq[(Int, Int)]) =
    mmdd.zipWithIndex.map { case ((m, d), i) =>
      (Timestamp.valueOf(f"2024-$m%02d-$d%02d 12:00:00"), i.toLong, i.toDouble) }
      .toDF("ts", "id", "v")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("evo"), name), rows(Seq((1, 1))).schema, Some("ts"), "year")

  test("year→day evolution: old files keep year dirs, new files day dirs, reads agree") {
    val t = fresh("y2d")
    t.append(rows(Seq((1, 1), (1, 2), (2, 1))))
    val specId = t.evolvePartitionSpec(Seq("ts" -> "day"))
    assert(specId == 1)
    t.append(rows(Seq((3, 1), (3, 2))))

    val paths = t.currentDataFiles.map(f => f.specIdOrZero -> f.path)
    assert(paths.filter(_._1 == 0).forall(_._2.matches("data/ts_year=\\d{4}/.+")),
      "pre-evolution files stay under year dirs untouched")
    assert(paths.filter(_._1 == 1).forall(_._2.matches("data/ts_day=\\d{8}/.+")),
      "post-evolution files land under day dirs")
    assert(paths.map(_._1).toSet == Set(0, 1))

    val back = t.read()
    assert(back.columns.toSet == Set("ts", "id", "v", "ts_day"),
      "read exposes the CURRENT spec's derived column for every epoch")
    assert(back.count() == 5)
    // old files' ts_day is re-derived from ts — same expression the
    // writer uses, so it matches the dir-recovered values of new files
    assert(back.filter(col("ts_day") =!=
      (year(col("ts")) * 100 + month(col("ts"))) * 100 + dayofmonth(col("ts")))
      .count() == 0)
  }

  test("evolution is metadata-only and time pruning spans both epochs") {
    val t = fresh("prune")
    t.append(rows(Seq((1, 1), (1, 2))))
    val filesBefore = t.currentDataFiles.map(_.path).toSet
    t.evolvePartitionSpec(Seq("ts" -> "day"))
    assert(t.currentDataFiles.map(_.path).toSet == filesBefore,
      "evolveSpec must not move a byte")
    t.append(rows(Seq((5, 1), (5, 2))))
    // footer-stat pruning is spec-independent: a January range keeps
    // only epoch-0 files, a May range only epoch-1 files
    val jan = t.filesOverlapping(usOf("2024-01-01 00:00:00"), usOf("2024-01-31 23:59:59"))
    val may = t.filesOverlapping(usOf("2024-05-01 00:00:00"), usOf("2024-05-31 23:59:59"))
    assert(jan.nonEmpty && jan.forall(_.path.contains("ts_year=")))
    assert(may.nonEmpty && may.forall(_.path.contains("ts_day=")))
  }

  test("time travel to a pre-evolution snapshot reads cleanly") {
    val t = fresh("tt")
    val s1 = t.append(rows(Seq((1, 1), (2, 2))))
    t.evolvePartitionSpec(Seq("ts" -> "day"))
    t.append(rows(Seq((6, 6))))
    val old = t.timeTravel(s1.id)
    assert(old.count() == 2)
    assert(old.columns.contains("ts_day"),
      "historical reads surface the current layout's columns")
  }

  test("compaction rewrites every epoch into the current spec") {
    val t = fresh("fold")
    t.append(rows(Seq((1, 1), (1, 2))))
    t.evolvePartitionSpec(Seq("ts" -> "day"))
    t.append(rows(Seq((2, 1))))
    t.compact()
    assert(t.currentDataFiles.forall(f =>
      f.specIdOrZero == 1 && f.path.matches("data/ts_day=\\d{8}/.+")),
      "compaction output is single-spec, current layout")
    assert(t.read().count() == 3)
  }

  test("evolution to identity+day composes; merge still works across epochs") {
    val src = Seq(("A", Timestamp.valueOf("2024-01-01 01:00:00"), 1.0),
      ("B", Timestamp.valueOf("2024-01-02 01:00:00"), 2.0))
      .toDF("sym", "ts", "v")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("evo"), "comp"), src.schema, Some("ts"), "year")
    t.append(src)
    t.evolvePartitionSpec(Seq("sym" -> "identity", "ts" -> "day"))
    t.append(Seq(("C", Timestamp.valueOf("2024-02-01 01:00:00"), 3.0)).toDF("sym", "ts", "v"))
    // COW merge touches an epoch-0 file; its rewrite lands under the NEW spec
    t.merge(Seq(("A", Timestamp.valueOf("2024-01-01 01:00:00"), 100.0))
      .toDF("sym", "ts", "v"), "ts")
    val got = t.read().select("sym", "v").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("A" -> 100.0, "B" -> 2.0, "C" -> 3.0))
    assert(t.filesForQuery(Map("sym" -> "A")).forall(f =>
      !f.path.contains("sym=") || f.path.contains("sym=A")))
  }

  test("guards: time source is sticky, duplicates and collisions refuse") {
    val t = fresh("guards")
    t.append(rows(Seq((1, 1))))
    val e1 = intercept[IllegalArgumentException](
      t.evolvePartitionSpec(Seq("v" -> "day")))
    assert(e1.getMessage.contains("time dimension"))
    val e2 = intercept[IllegalArgumentException](
      t.evolvePartitionSpec(Seq("ts" -> "day", "ts" -> "day")))
    assert(e2.getMessage.contains("duplicate"))
    val e3 = intercept[IllegalArgumentException](
      t.evolvePartitionSpec(Seq("ts" -> "year")))
    assert(e3.getMessage.contains("identical"))
    val e4 = intercept[IllegalArgumentException](
      t.evolvePartitionSpec(Seq("nope" -> "identity")))
    assert(e4.getMessage.contains("not a table column"))
    // retired dir names are fenced against adoption as data columns
    t.evolvePartitionSpec(Seq("ts" -> "day"))
    val e5 = intercept[IllegalArgumentException](
      t.appendEvolving(rows(Seq((7, 7))).withColumn("ts_year", lit(1))))
    assert(e5.getMessage.contains("partition-directory"))
  }

  test("incremental reads span an evolution boundary") {
    val t = fresh("inc")
    val s1 = t.append(rows(Seq((1, 1))))
    t.evolvePartitionSpec(Seq("ts" -> "day"))
    t.append(rows(Seq((2, 2), (2, 3))))
    val delta = t.readIncremental(s1.id)
    assert(delta.count() == 2, "evolution commit adds no rows; delta is the new append")
    assert(delta.columns.contains("ts_day"))
  }
}
