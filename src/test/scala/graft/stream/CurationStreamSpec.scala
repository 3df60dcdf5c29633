package graft.stream

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming curation = gate → redact → index-dedup per micro-batch:
  * low-quality docs die at the gate, PII never reaches the clean table,
  * near-dups are caught across batch boundaries, and the composition
  * order holds (gate signals on raw text, signatures on redacted text).
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  // 25 distinct tokens: passes every gate signal
  private val good =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo " +
      "lima mike november oscar papa quebec romeo sierra tango uniform " +
      "victor whiskey xray yankee"
  private val goodB =
    "zulu one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
      "apple banana cherry dates"

  private val bandsOf: DataFrame => DataFrame = d =>
    d.select(col("doc_id"), lit(0L).as("band_id"),
      xxhash64(col("text")).as("band_sig"))

  private def fixtures(name: String) = {
    val root = tmpDir("cstream")
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    val src = LakehouseTable.createIfNotExists(
      spark, new Path(root, s"$name-src"), schema, None)
    val dst = LakehouseTable.createIfNotExists(
      spark, new Path(root, s"$name-dst"), schema, None)
    val idx = DedupIndex.createIndex(spark, new Path(root, s"$name-idx"))
    (src, dst, idx)
  }

  test("gate, redaction, and cross-batch dedup compose on the stream") {
    val (src, dst, idx) = fixtures("full")
    val q = new TableStreamQuery(
      src, dst, "curate",
      CurationStream.transform(idx, dst, "curate", bandsOf),
      pollIntervalMs = 60000L, maxSnapshotsPerBatch = Int.MaxValue,
      emitUpserts = false, cdcKeys = None)

    src.append(Seq(
      1L -> good,
      2L -> "too short to pass",
      3L -> s"$goodB mail me at alice@example.com today ok"
    ).toDF("doc_id", "text"))
    assert(q.step())

    val afterB1 = dst.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterB1.keySet == Set(1L, 3L)) // 2 died at the gate
    assert(afterB1(3L).contains("<EMAIL>") && !afterB1(3L).contains("alice@"))

    // batch 2: 4 repeats doc 1's text exactly → cross-batch dup; 5 is new
    src.append(Seq(4L -> good, 5L -> (goodB + " extra distinct closing words here"))
      .toDF("doc_id", "text"))
    assert(q.step())
    assert(dst.read().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 3L, 5L))
  }

  test("signatures are computed on REDACTED text: PII-only variants are dups") {
    val (src, dst, idx) = fixtures("redsig")
    val q = new TableStreamQuery(
      src, dst, "curate",
      CurationStream.transform(idx, dst, "curate", bandsOf),
      pollIntervalMs = 60000L, maxSnapshotsPerBatch = Int.MaxValue,
      emitUpserts = false, cdcKeys = None)

    src.append(Seq(1L -> s"$good reach bob@sample.org now then").toDF("doc_id", "text"))
    assert(q.step())
    // same doc, different email — identical after redaction → duplicate
    src.append(Seq(2L -> s"$good reach eve@other.net now then").toDF("doc_id", "text"))
    assert(q.step())
    assert(dst.read().select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }
}
