package graft.ingest

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Driver-state scaling: ledger persists are O(entries since last
  * persist) via JSONL segments (with last-wins replay, torn-tail
  * tolerance, and threshold compaction), and audit appends are O(1)
  * one-file-per-run — neither ever rewrites its history.
  */
class SegmentedStateSpec extends SparkSpec {

  private def fsOf(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  private def tmpParquet(name: String, content: String): Path = {
    val p = new Path(tmpDir("seg"), name)
    val fs = fsOf(p)
    val out = fs.create(p, true)
    out.write(content.getBytes("UTF-8")); out.close()
    p
  }

  test("persist writes only the delta; reload merges segments last-wins") {
    val base = new Path(tmpDir("seg"), "ledger.json")
    val fs = fsOf(base)
    val ledger = new ChecksumLedger(base, fs)
    val f1 = tmpParquet("a.parquet", "v1")
    val f2 = tmpParquet("b.parquet", "v1")

    ledger.record(f1, ledger.checksum(f1))
    ledger.persist()
    ledger.record(f2, ledger.checksum(f2))
    ledger.persist()
    ledger.persist() // nothing dirty: must not write a third segment

    val segDir = new Path(base.getParent, "ledger.d")
    val segs = fs.listStatus(segDir).map(_.getPath.getName).sorted
    assert(segs.length == 2, s"expected 2 delta segments, got ${segs.toSeq}")

    // modify f1: new checksum recorded in a NEW segment; reload resolves
    // last-wins to the new value
    val out = fs.create(f1, true); out.write("v2".getBytes("UTF-8")); out.close()
    val sum2 = ledger.checksum(f1)
    assert(!ledger.isUnchanged(f1, sum2))
    ledger.record(f1, sum2)
    ledger.persist()

    val reloaded = new ChecksumLedger(base, fs)
    assert(reloaded.size == 2)
    assert(reloaded.isUnchanged(f1, sum2))
    assert(reloaded.isKnown(f2))
  }

  test("segments compact past the threshold; state survives the fold") {
    val base = new Path(tmpDir("seg"), "ledger.json")
    val fs = fsOf(base)
    val ledger = new ChecksumLedger(base, fs, compactThreshold = 3)
    val files = (0 until 5).map(i => tmpParquet(s"f$i.parquet", s"content$i"))
    files.foreach { f => ledger.record(f, ledger.checksum(f)); ledger.persist() }

    val segDir = new Path(base.getParent, "ledger.d")
    val nSegs = fs.listStatus(segDir).count(_.getPath.getName.endsWith(".jsonl"))
    assert(nSegs <= 3, s"compaction never ran: $nSegs segments")
    val reloaded = new ChecksumLedger(base, fs)
    assert(reloaded.size == 5)
    files.foreach(f => assert(reloaded.isKnown(f)))
  }

  test("a torn trailing line is skipped; complete lines still load") {
    val base = new Path(tmpDir("seg"), "ledger.json")
    val fs = fsOf(base)
    val ledger = new ChecksumLedger(base, fs)
    val f1 = tmpParquet("a.parquet", "v1")
    ledger.record(f1, ledger.checksum(f1))
    ledger.persist()
    // simulate a crashed writer: a segment whose last line is cut off
    val torn = new Path(base.getParent, "ledger.d/seg-00000001.jsonl")
    val out = fs.create(torn, false)
    out.write("{\"f\":\"/x/complete.parquet\",\"md5\":\"abc\"}\n{\"f\":\"/x/tor".getBytes("UTF-8"))
    out.close()

    val reloaded = new ChecksumLedger(base, fs)
    assert(reloaded.isKnown(f1))
    assert(reloaded.isKnown(new Path("/x/complete.parquet")))
    assert(reloaded.size == 2) // the torn record never landed
  }

  test("audit appends one file per run and never rewrites history") {
    val base = new Path(tmpDir("seg"), "audit_log.json")
    val fs = fsOf(base)
    val audit = new AuditLog(base, fs)
    def run(id: String) = RunSummary(id, "t0", "t1", 1.0, Nil, 0L, Nil)
    audit.append(run("r1"))
    val dir = new Path(base.getParent, "audit_log.d")
    val mtime1 = fs.getFileStatus(new Path(dir, "run-00000000.json")).getModificationTime
    Thread.sleep(20)
    audit.append(run("r2"))
    // the first run's file is untouched by the second append
    assert(fs.getFileStatus(new Path(dir, "run-00000000.json")).getModificationTime == mtime1)
    assert(audit.readAll().map(_.runId) == Seq("r1", "r2"))

    // torn run file (crashed writer) is skipped, the rest still read
    val out = fs.create(new Path(dir, "run-00000002.json"), false)
    out.write("{\"runId\": \"r3".getBytes("UTF-8")); out.close()
    assert(audit.readAll().map(_.runId) == Seq("r1", "r2"))
  }
}
