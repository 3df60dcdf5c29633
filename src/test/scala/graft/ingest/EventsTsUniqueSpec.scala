package graft.ingest

import graft.SparkSpec

/** Guards the corpus assumption the q_lake_* oracles lean on
  * (`queries/LakeOps.scala`): `events.ts` (µs precision) has no
  * duplicates at the test scale factors, so "dedup on first ingest is a
  * no-op" and "merge batches are unique on ts" hold exactly. If a
  * regenerated corpus ever breaks this, fail here — not as a confusing
  * oracle hash mismatch.
  */
class EventsTsUniqueSpec extends SparkSpec {
  test("events ts is unique at every available test scale factor") {
    val checked = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf/events.parquet")
      .filter(p => new java.io.File(p).exists())
    assert(checked.nonEmpty, "no test corpus found under /root/testdata")
    checked.foreach { p =>
      val ev = spark.read.parquet(p)
      val (total, distinct) = (ev.count(), ev.select("ts").distinct().count())
      assert(total == distinct, s"$p has ${total - distinct} duplicate ts keys")
    }
  }
}
