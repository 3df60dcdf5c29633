package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** [[LakehouseTable.readChangeFeed]]: row-level insert/upsert/delete
  * events whose by-key max-sequence fold reproduces the table exactly —
  * deletes as full pre-images, COW rewrites refused loudly.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int], bid: Int => Double = _.toDouble) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toLong, bid(i)))
      .toDF("DateTime", "EventId", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("cdf"), name), df(Seq(0)).schema, Some("DateTime"))

  /** By-key CDC apply: keep each key's max-_commit_seq event; delete ⇒
    * absent, else the image.
    */
  private def fold(cdf: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("EventId").orderBy(col("_commit_seq").desc)
    cdf.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .filter(col("_change_type") =!= "delete")
      .select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def state(t: LakehouseTable): Map[Long, Double] =
    t.read().select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("insert + upsert + equality-delete + positional-delete fold to the table state") {
    val t = fresh("mix")
    t.append(df(0 until 6))
    val from = t.metadata.currentSnapshotId.get
    t.append(df(6 until 9))                                   // insert
    t.morMerge(df(Seq(1, 6), _ => 500.0), "EventId")          // upsert (update 1,6)
    t.morDeleteKeys(Seq(2L).toDF("EventId"), "EventId")       // equality delete
    t.morDeleteWhere(col("EventId") === 7L)                   // positional delete
    t.morMerge(df(Seq(2), _ => 900.0), "EventId")             // re-insert a deleted key
    val cdf = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)

    val types = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types("insert") == 3L, s"3 appended rows, got $types")
    assert(types("upsert") == 3L, s"2 + 1 upsert images, got $types")
    assert(types("delete") == 2L, s"one eq + one pos pre-image, got $types")

    // delete events carry the FULL pre-image, not just the key
    val preImages = cdf.filter(col("_change_type") === "delete")
      .select("EventId", "Bid").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(preImages == Map(2L -> 2.0, 7L -> 7.0),
      s"pre-images must show the deleted rows' values, got $preImages")

    // the by-key fold over (seed image + feed) reproduces the table
    val seed = t.timeTravel(from)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_seq", lit(from))
    assert(fold(seed.unionByName(cdf)) == state(t),
      "CDC fold must reproduce the table's end state")
  }

  test("a COW rewrite refuses the change feed loudly") {
    val t = fresh("cow")
    t.append(df(0 until 4))
    val from = t.metadata.currentSnapshotId.get
    t.update(col("EventId") === 1L, Map("Bid" -> lit(99.0))) // COW rewrite
    val e = intercept[UnsupportedOperationException] {
      t.readChangeFeed(from, t.metadata.currentSnapshotId.get).count()
    }
    assert(e.getMessage.contains("merge-on-read"),
      s"error must route the caller to the MoR paths: ${e.getMessage}")
  }

  test("compaction inside the range is skipped; the feed stays exact") {
    val t = fresh("compact")
    t.append(df(0 until 4))
    val from = t.metadata.currentSnapshotId.get
    t.append(df(4 until 6))
    t.morDeleteKeys(Seq(0L).toDF("EventId"), "EventId")
    t.compact()
    t.append(df(6 until 8))
    val cdf = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)
    val seed = t.timeTravel(from)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_seq", lit(from))
    assert(fold(seed.unionByName(cdf)) == state(t),
      "compaction moves rows, changes nothing — the fold must still match")
    assert(cdf.filter(col("_change_type") === "delete").count() == 1L)
  }

  test("timestamp-anchored feed: changes after the as-of snapshot; pre-table times throw") {
    val t = fresh("since")
    t.append(df(0 until 3))
    val ts1 = t.metadata.currentSnapshot.get.timestampMs
    Thread.sleep(5)
    t.append(df(3 until 5))
    // incremental twin resolves the same anchor (checked while the
    // range is still append-only)
    assert(t.readIncrementalSince(ts1).select("EventId").collect()
      .map(_.getLong(0)).toSet == Set(3L, 4L))
    t.morDeleteKeys(Seq(0L).toDF("EventId"), "EventId")
    val since = t.readChangeFeedSince(ts1)
      .select("EventId", "_change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(since == Map(3L -> "insert", 4L -> "insert", 0L -> "delete"), s"got $since")
    val e = intercept[IllegalArgumentException] { t.readChangeFeedSince(ts1 - 10000) }
    assert(e.getMessage.contains("starts later"))
  }

  test("a mixed cdc-apply commit feeds tombstones as deletes, not silently as nothing") {
    val t = fresh("mixed-apply")
    t.append(df(0 until 6))
    val from = t.metadata.currentSnapshotId.get
    // one atomic commit: images for 1,2 plus a tombstone for 4 — the
    // replica shape a chained (second-tier) CDC consumer reads
    t.morApplyStream("m", 1L,
      images = df(Seq(1, 2)).withColumn("Bid", lit(700.0)),
      deleteKeys = Seq(4L).toDF("EventId"),
      keyCols = Seq("EventId"))
    val cdf = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)
    val events = cdf.select("EventId", "Bid", "_change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(events == Set((1L, 700.0, "upsert"), (2L, 700.0, "upsert"), (4L, 4.0, "delete")),
      s"tombstoned key must emit a delete PRE-image, got $events")
    val seed = t.timeTravel(from)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_seq", lit(from))
    assert(fold(seed.unionByName(cdf)) == state(t),
      "the chained fold must reproduce the replica exactly")
    // the upsert-image-only stream cannot express the tombstone: loud, not lossy
    val e = intercept[UnsupportedOperationException] {
      t.readIncremental(from, t.metadata.currentSnapshotId.get, emitUpserts = true).count()
    }
    assert(e.getMessage.contains("readChangeFeed"), e.getMessage)
  }

  test("a tombstone-free cdc-apply commit feeds pure upserts (label over-trigger is harmless)") {
    val t = fresh("apply-clean")
    t.append(df(0 until 4))
    val from = t.metadata.currentSnapshotId.get
    // cdc-apply with images only: the label routes it through the
    // exclusion join, which must emit ZERO delete events
    t.morApplyStream("m", 1L,
      images = df(Seq(1, 2)).withColumn("Bid", lit(50.0)),
      deleteKeys = df(Seq.empty[Int]).select("EventId"),
      keyCols = Seq("EventId"))
    val cdf = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)
    val types = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("upsert" -> 2L),
      s"no tombstones ⇒ no delete events, got $types")
    val seed = t.timeTravel(from)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_seq", lit(from))
    assert(fold(seed.unionByName(cdf)) == state(t))
  }

  test("morApplyStream rejects null-keyed and duplicate-keyed batches loudly") {
    val t = fresh("apply-guard")
    t.append(df(0 until 4))
    // null-keyed image: would vanish from the delete mask and corrupt
    // count-based feed classification downstream
    val nullImg = df(Seq(1)).withColumn("EventId", lit(null).cast("long"))
    val e1 = intercept[IllegalArgumentException] {
      t.morApplyStream("g", 1L, images = nullImg,
        deleteKeys = df(Seq.empty[Int]).select("EventId"), keyCols = Seq("EventId"))
    }
    assert(e1.getMessage.contains("null key"), e1.getMessage)
    // duplicate-keyed images: the per-key fold precondition
    val e2 = intercept[IllegalArgumentException] {
      t.morApplyStream("g", 2L, images = df(Seq(1)).unionByName(df(Seq(1))),
        deleteKeys = df(Seq.empty[Int]).select("EventId"), keyCols = Seq("EventId"))
    }
    assert(e2.getMessage.contains("not unique"), e2.getMessage)
    // null tombstone key: the deletion would silently never match — the
    // guard now raises INSIDE the delete-write job (one fewer job per
    // trigger), so it surfaces as a Spark job failure carrying the
    // message in its cause chain
    val e3 = intercept[Exception] {
      t.morApplyStream("g", 3L, images = df(Seq.empty[Int]),
        deleteKeys = Seq[Option[Long]](None).toDF("EventId"), keyCols = Seq("EventId"))
    }
    val msgs3 = Iterator.iterate(e3: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString("\n")
    assert(msgs3.contains("null key"), msgs3)
    // nothing committed, no watermark advanced: batch 1 applies cleanly after fixes
    assert(t.metadata.streamWatermarks.get("g").isEmpty)
    t.morApplyStream("g", 1L, images = df(Seq(1), _ => 42.0),
      deleteKeys = df(Seq.empty[Int]).select("EventId"), keyCols = Seq("EventId"))
    assert(state(t)(1L) == 42.0)
  }

  test("a composite-key delete's pre-images resolve through the key columns") {
    val withSrc = df(0 until 6).withColumn("Src", concat(lit("s"), col("EventId") % 2))
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("cdf"), "composite"), withSrc.schema, Some("DateTime"))
    t.append(withSrc)
    val from = t.metadata.currentSnapshotId.get
    t.morDeleteKeys(
      Seq((2L, "s0"), (3L, "s1")).toDF("EventId", "Src"), Seq("EventId", "Src"))
    val dels = t.readChangeFeed(from, t.metadata.currentSnapshotId.get)
      .filter(col("_change_type") === "delete")
      .select("EventId", "Src").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dels == Set((2L, "s0"), (3L, "s1")),
      s"composite-key pre-images must match on ALL components, got $dels")
  }

  test("attested apply moves EVERY mask part under maxRecordsPerFile (ADVICE r11)") {
    val t = fresh("multi-part-masks")
    t.append(df(0 until 20))
    val confKey = "spark.sql.files.maxRecordsPerFile"
    val prev = spark.conf.getOption(confKey)
    // force the coalesce(1) mask write to split into many parquet parts
    spark.conf.set(confKey, "2")
    try {
      val images = df(0 until 8).withColumn("Bid", lit(99.0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      images.count()
      try t.morApplyStream("mp", 1L, images = images,
        deleteKeys = (10 until 16).map(_.toLong).toDF("EventId"),
        keyCols = Seq("EventId"), stableValidatedImages = true)
      finally images.unpersist(blocking = false)
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    // the masks really did split — and every part survived the staging move
    val masks = t.currentDeleteFiles
    assert(masks.size >= 4, s"expected multiple mask parts per side, got ${masks.size}")
    assert(masks.map(_.rows).sum == 8L + 6L,
      s"mask rows must equal image + tombstone rows exactly, got ${masks.map(_.rows).sum}")
    // row-level outcome: no upsert or deletion silently lost
    val s = state(t)
    assert((0 until 8).forall(i => s(i.toLong) == 99.0), s"upsert images lost: $s")
    assert((10 until 16).forall(i => !s.contains(i.toLong)), s"tombstones lost: $s")
    assert(s.size == 14, s"expected 14 live keys, got ${s.size}")
  }
}
