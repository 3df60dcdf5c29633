package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

/** Named snapshot refs (Iceberg tags): time travel by name, pinning
  * against expiry, and release on removal.
  */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Int]) =
    ids.map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.$i%06d"), i.toDouble))
      .toDF("DateTime", "Bid")

  private def fresh(name: String): LakehouseTable =
    LakehouseTable.createIfNotExists(
      spark, new Path(tmpDir("tag"), name), df(Seq(0)).schema, Some("DateTime"))

  test("tag pins a snapshot and readTag time-travels to it") {
    val t = fresh("basic")
    val s1 = t.append(df(0 until 4))
    t.append(df(4 until 9))
    t.tagSnapshot("train-v1", s1.id)
    assert(t.tags == Map("train-v1" -> s1.id))
    assert(t.readTag("train-v1").count() == 4)
    assert(t.read().count() == 9)
  }

  test("expiry never drops a tagged snapshot; removing the tag releases it") {
    val t = fresh("pin")
    val s1 = t.append(df(Seq(0)))
    t.tagSnapshot("keep", s1.id)
    t.append(df(Seq(1)))
    t.append(df(Seq(2)))
    t.append(df(Seq(3)))

    val (expired1, _) = t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    assert(!expired1.contains(s1.id), "tagged snapshot must survive expiry")
    assert(t.readTag("keep").count() == 1)

    t.removeTag("keep")
    val (expired2, _) = t.expireSnapshots(retentionMs = 0L, keepLast = 2)
    assert(expired2.contains(s1.id), "untagged snapshot becomes expirable")
    assert(t.tags.isEmpty)
  }

  test("re-tagging re-points; unknown snapshot or tag fails loudly") {
    val t = fresh("edges")
    val s1 = t.append(df(Seq(0)))
    val s2 = t.append(df(Seq(1)))
    t.tagSnapshot("v", s1.id)
    t.tagSnapshot("v", s2.id)
    assert(t.tags("v") == s2.id)
    intercept[IllegalArgumentException](t.tagSnapshot("bad", 999L))
    intercept[IllegalArgumentException](t.removeTag("absent"))
    intercept[NoSuchElementException](t.readTag("absent"))
  }

  test("stream pin protects only the main-ancestry pin→head segment, not abandoned lineages") {
    val t = fresh("pin-segment")
    val s1 = t.append(df(Seq(0)))
    t.pinStreamOffset("consumer", s1.id)
    // two commits that will be ROLLED BACK — ids above the pin floor
    // but off the resume path once main rewinds
    val bad1 = t.append(df(Seq(1)))
    val bad2 = t.append(df(Seq(2)))
    t.rollbackTo(s1.id)
    // fresh main lineage on top of the pin
    val good = t.append(df(Seq(3)))
    val head = t.append(df(Seq(4)))

    val (expired, _) = t.expireSnapshots(
      nowMs = System.currentTimeMillis() + 1000L, retentionMs = 0L, keepLast = 1)
    // the resume chain walk (pin → head) can only touch head's
    // ancestors: s1, good, head survive; the abandoned commits age out
    assert(Set(bad1.id, bad2.id).subsetOf(expired.toSet),
      s"abandoned lineage above the pin floor must expire, expired=$expired")
    assert(!expired.contains(s1.id) && !expired.contains(good.id) && !expired.contains(head.id),
      s"pin→head main ancestry must survive, expired=$expired")
    // the consumer's resume read still works end-to-end
    assert(t.readIncremental(s1.id, head.id).count() == 2L)
  }
}
