package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Manifest-resident per-file key blooms (`write.key-bloom.bits`,
  * SURVEY §7.5 / VERDICT r10 #6): the ingest-dedup build side skips
  * within-time-bounds files that provably share no key with the
  * incoming batch, probed DISTRIBUTED against the batch (no key is
  * collected to the driver). The load-bearing property is ZERO FALSE
  * NEGATIVES: a file containing any batch key is never skipped, so
  * [[graft.ingest.Dedup.dropExisting]] through blooms equals the
  * brute-force path exactly.
  */
class KeyBloomSpec extends SparkSpec {
  import spark.implicits._

  // files with fully overlapping µs time ranges but disjoint key sets:
  // residue r of 4 in one file per append
  private def residue(r: Int, n: Int = 40) =
    (0 until n).map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.${4 * i + r}%06d"),
      (4 * i + r).toDouble))
      .toDF("DateTime", "Bid").coalesce(1)

  private def usOf(micro: Int) =
    Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L + micro

  private def mkTable(name: String, bits: Option[Int]): LakehouseTable = {
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir(name), "t"), residue(0).schema, Some("DateTime"))
    bits.foreach(b => t.setProperty("write.key-bloom.bits", b.toString))
    t
  }

  test("appends record manifest blooms; within-bounds files with no batch key are skipped") {
    val t = mkTable("kb1", Some(4096))
    (0 until 4).foreach(r => t.append(residue(r)))
    val files = t.currentDataFiles
    assert(files.size == 4 && files.forall(_.keyBloom.isDefined))
    assert(files.forall(_.keyBloom.get.bits == 4096))
    // ranges fully interleave: time bounds alone keep all 4 files
    val candidates = t.filesOverlapping(usOf(0), usOf(200))
    assert(candidates.size == 4)
    // a batch holding only residue-2 keys: the probe may keep only
    // files that could hold them — file r=2 MUST survive (no false
    // negative); the others may only survive as false positives
    val batch = Seq(usOf(2), usOf(6), usOf(10)).toDF("_ku")
    val (kept, skipped) = t.bloomSurvivors(candidates, batch)
    val keptKeys = kept.flatMap(f =>
      spark.read.parquet(new Path(t.tableDir, f.path).toString)
        .select(unix_micros(col("DateTime"))).as[Long].collect())
    assert(Seq(usOf(2), usOf(6), usOf(10)).forall(keptKeys.contains),
      "a file containing a batch key was skipped — false negative")
    assert(skipped >= 1, s"4096-bit blooms over 40 keys should skip some of 4 files")
  }

  test("dedup through blooms equals the brute-force anti-join exactly") {
    val t = mkTable("kb2", Some(4096))
    (0 until 4).foreach(r => t.append(residue(r)))
    // batch = half old keys (residues 0,1) + new keys past the range
    val batch = ((0 until 20).map(i => 4 * i) ++ (0 until 20).map(i => 4 * i + 1) ++
      (300 until 310))
      .map(m => (Timestamp.valueOf(f"2024-01-01 00:00:00.$m%06d"), m.toDouble))
      .toDF("DateTime", "Bid")
    val viaBlooms = graft.ingest.Dedup.dropExisting(batch, t, "DateTime")
      .select(unix_micros(col("DateTime"))).as[Long].collect().sorted.toSeq
    val brute = batch.join(t.read().select("DateTime"), Seq("DateTime"), "left_anti")
      .select(unix_micros(col("DateTime"))).as[Long].collect().sorted.toSeq
    assert(viaBlooms == brute)
    assert(viaBlooms == (300 until 310).map(m => usOf(m)).sorted)
  }

  test("tables without the property record no blooms and never skip") {
    val t = mkTable("kb3", None)
    (0 until 2).foreach(r => t.append(residue(r)))
    assert(t.currentDataFiles.forall(_.keyBloom.isEmpty))
    val (kept, skipped) = t.bloomSurvivors(
      t.currentDataFiles, Seq(usOf(999)).toDF("_ku"))
    assert(kept.size == 2 && skipped == 0)
  }

  test("a foreign hash count is conservatively kept, never probed") {
    val t = mkTable("kb4", Some(4096))
    t.append(residue(0))
    val f = t.currentDataFiles.head
    val foreign = f.copy(keyBloom = f.keyBloom.map(_.copy(hashes = 2)))
    val (kept, skipped) = t.bloomSurvivors(Seq(foreign), Seq(usOf(999)).toDF("_ku"))
    assert(kept.size == 1 && skipped == 0)
  }

  test("all-null-key files carry an all-zero bloom and are skipped for any batch") {
    val df = Seq((null: Timestamp, 1.0), (null: Timestamp, 2.0))
      .toDF("DateTime", "Bid").coalesce(1)
    val t = mkTable("kb5", Some(1024))
    t.append(residue(0))
    t.append(df)
    val withNullKeys = t.currentDataFiles.filter(_.minKeyUs.isEmpty)
    assert(withNullKeys.size == 1 && withNullKeys.head.keyBloom.isDefined)
    assert(withNullKeys.head.keyBloom.get.wordArray.forall(_ == 0L))
    val (kept, skipped) = t.bloomSurvivors(withNullKeys, Seq(usOf(0)).toDF("_ku"))
    assert(kept.isEmpty && skipped == 1)
  }

  test("compaction rewrites keep recording blooms (maintenance preserves skipping)") {
    val t = mkTable("kb7", Some(4096))
    (0 until 4).foreach(r => t.append(residue(r)))
    t.compact()
    val files = t.currentDataFiles
    assert(files.nonEmpty && files.forall(_.keyBloom.isDefined),
      "compacted files must carry fresh blooms — a compaction that dropped " +
        "them would silently disable build-side skipping")
    // the compacted bloom still answers for every original key
    val keys = (0 until 160).map(usOf).toDF("_ku")
    val (kept, _) = t.bloomSurvivors(files, keys)
    val keptKeys = kept.flatMap(f =>
      spark.read.parquet(new Path(t.tableDir, f.path).toString)
        .select(unix_micros(col("DateTime"))).as[Long].collect())
    assert((0 until 160).map(usOf).forall(keptKeys.contains))
  }

  test("driver-side probe positions are bit-identical to the SQL predicate's") {
    // the parity that makes zero-I/O manifest-bloom point skipping safe:
    // a divergence between the catalyst XXH64 replication and the SQL
    // xxhash64(ku, i) expression would become false-negative skips
    val m = 4096L
    val keys: Seq[Long] = (Seq(0L, -1L, Long.MaxValue, Long.MinValue) ++
      (1 to 60).map(j => j * 982451653L - 31L * j * j)).distinct
    val probe = KeyBloom(m.toInt, LakehouseTable.KeyBloomHashes, "")
    val cols = (0 until LakehouseTable.KeyBloomHashes).map(i =>
      pmod(xxhash64(col("k"), lit(i)), lit(m)).as(s"p$i")) :+ col("k")
    keys.toDF("k").select(cols: _*).collect().foreach { r =>
      val k = r.getLong(LakehouseTable.KeyBloomHashes)
      val sql = (0 until LakehouseTable.KeyBloomHashes).map(r.getLong(_))
      assert(probe.probePositions(k).toSeq == sql,
        s"probe positions diverge for key $k")
    }
  }

  test("point-lookup planning skips bloom-excluded files without a footer open") {
    val t = mkTable("kb8", Some(4096))
    (0 until 4).foreach(r => t.append(residue(r)))
    // keys of residue 1 only: ranges interleave (every file overlaps),
    // but only file r=1 can contain them
    val keys = Seq(usOf(1), usOf(5), usOf(9))
    val files = t.filesContainingAnyKey(keys)
    val present = files.flatMap(f =>
      spark.read.parquet(new Path(t.tableDir, f.path).toString)
        .select(unix_micros(col("DateTime"))).as[Long].collect())
    assert(keys.forall(present.contains), "no false-negative point skips")
    assert(files.size < 4, "manifest blooms must reject interleaved keyless files")
    // a key nobody holds plans zero files
    assert(t.filesContainingAnyKey(Seq(usOf(999999))).isEmpty)
  }

  test("blooms survive the JSON manifest round-trip bit-for-bit") {
    val t = mkTable("kb6", Some(256))
    t.append(residue(3))
    // read back through a FRESH log instance (no shared in-memory state)
    SnapshotLog.clearPlanningCache()
    val reloaded = LakehouseTable.load(spark, t.tableDir).currentDataFiles.head
    val b = reloaded.keyBloom.get
    assert(b.bits == 256 && b.hashes == LakehouseTable.KeyBloomHashes)
    assert(b.wordArray.length == 4)
    assert(b.wordArray.exists(_ != 0L))
    // the reloaded bloom still finds every key the file holds
    val keys = (0 until 40).map(i => usOf(4 * i + 3)).toDF("_ku")
    val (kept, _) = t.bloomSurvivors(Seq(reloaded), keys)
    assert(kept.size == 1)
  }

  test("an empty or all-null key frame keeps every file (ADVICE r11)") {
    val t = mkTable("kb8", Some(4096))
    (0 until 3).foreach(r => t.append(residue(r)))
    val candidates = t.filesOverlapping(usOf(0), usOf(200))
    assert(candidates.size == 3)
    // no keys ⇒ no pruning information ⇒ nothing may be skipped: a
    // caller outside the dedup shape would otherwise get a silently
    // partial range read
    val empty = Seq.empty[Long].toDF("_ku")
    val (k1, s1) = t.bloomSurvivors(candidates, empty)
    assert(k1.size == 3 && s1 == 0)
    val allNull = Seq[Option[Long]](None, None).toDF("_ku")
    val (k2, s2) = t.bloomSurvivors(candidates, allNull)
    assert(k2.size == 3 && s2 == 0)
    assert(t.readRangeForKeys(usOf(0), usOf(200), empty).count() ==
      t.readRange(usOf(0), usOf(200)).count())
  }

  test("blooms attach under partition dirs needing URI escaping (ADVICE r11)") {
    // input_file_name() URI-escapes paths — a space in an identity
    // partition value must not silently disable the bloom for its files
    val data = (0 until 8).map(i =>
      ("A B", Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toDouble))
      .toDF("Sym", "DateTime", "Bid")
    val t = LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("kb-esc"), "t"), data.schema,
      Seq("Sym" -> "identity", "DateTime" -> "day"))
    t.setProperty("write.key-bloom.bits", "4096")
    t.append(data)
    val files = t.currentDataFiles
    assert(files.nonEmpty && files.forall(f => f.path.contains("Sym=A B")))
    assert(files.forall(_.keyBloom.isDefined),
      s"escaped dir broke bloom attachment: " +
        files.map(f => f.path -> f.keyBloom.isDefined).mkString(", "))
    // and the attached bloom answers: a foreign key skips the file
    val (kept, skipped) = t.bloomSurvivors(files, Seq(usOf(999999)).toDF("_ku"))
    assert(skipped == files.size, s"kept=${kept.size} skipped=$skipped")
  }
}
