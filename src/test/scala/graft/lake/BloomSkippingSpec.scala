package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.sql.Timestamp

/** Point-key file skipping via parquet bloom filters: min/max bounds
  * cannot separate two files whose key RANGES interleave, but the bloom
  * written at commit time rejects the file that does not hold the key.
  */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  // two files with fully overlapping µs ranges but disjoint keys:
  // evens in one, odds in the other
  private def parity(p: Int) =
    (0 until 50).map(i => (Timestamp.valueOf(f"2024-01-01 00:00:00.${2 * i + p}%06d"),
      (2 * i + p).toDouble))
      .toDF("DateTime", "Bid").coalesce(1)

  private def usOf(micro: Int) =
    Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L + micro

  test("bloom rejects a file whose range contains the key but whose data does not") {
    val dir = new Path(tmpDir("bloom"), "t")
    val evens = parity(0)
    val table = LakehouseTable.createIfNotExists(spark, dir, evens.schema, Some("DateTime"))
    table.append(evens)   // keys 0,2,...,98 µs
    table.append(parity(1)) // keys 1,3,...,99 µs — ranges interleave

    // range pruning alone cannot separate them
    assert(table.filesOverlapping(usOf(50), usOf(50)).size == 2)
    // the bloom can: key 50 lives only in the evens file
    val hit = table.filesContainingAnyKey(Seq(usOf(50)))
    assert(hit.size == 1, s"bloom did not skip: $hit")

    val rows = table.readPoints(Seq(usOf(50), usOf(51)))
    assert(rows.count() == 2)
    assert(rows.select("Bid").as[Double].collect().sorted.toSeq == Seq(50.0, 51.0))
    // a key inside the global range but in neither file reads nothing
    assert(table.readPoints(Seq(usOf(100) + 1)).count() == 0)
  }

  test("multiple keys hitting both files keep both") {
    val dir = new Path(tmpDir("bloom"), "t2")
    val evens = parity(0)
    val table = LakehouseTable.createIfNotExists(spark, dir, evens.schema, Some("DateTime"))
    table.append(evens)
    table.append(parity(1))
    assert(table.filesContainingAnyKey(Seq(usOf(10), usOf(11))).size == 2)
  }
}
