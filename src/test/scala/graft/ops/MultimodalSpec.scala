package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL concatenated-P6 codec (round 11): encode documents' bytes
  * into PPM streams, decode them back with the strict parser, and check
  * the decoded stats against independent recomputation. Malformed
  * payloads must refuse loudly — the contract a real decoder has.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(docs)

  test("media table carries binary payloads with typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val row = media.orderBy("media_id").first()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[Map[String, String]]("meta").contains("lang"))
    assert(row.getAs[String]("mime").startsWith("image/x-portable-pixmap"))
  }

  test("decoded features match an independent recomputation from the source bytes") {
    val expected = docs.collect().map { r =>
      val bytes = r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val l = bytes.length
      val w = 4 + l % 5; val h = 3 + l % 4; val f = 1 + l % 3; val p = w * h * 3
      val sum = bytes.take(math.min(l, f * p)).map(b => (b & 0xff).toLong).sum
      r.getAs[Long]("doc_id") -> ((f.toLong * (11 + p), w.toLong, h.toLong, f.toLong, sum))
    }.toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == expected.size)
    feats.foreach { r =>
      val (bl, w, h, f, sum) = expected(r.getAs[Long]("media_id"))
      assert(r.getAs[Long]("byte_len") == bl, s"byte_len of ${r.getAs[Long]("media_id")}")
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      assert(r.getAs[Long]("n_frames") == f)
      assert(r.getAs[Long]("pixel_sum") == sum)
    }
  }

  test("the parser handles real-format freedoms: comments, whitespace, any 1-byte maxval") {
    val pixels = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 7).toByte)
    val payload = ("P6 # a comment\n# another\n 2\t2\n200\n".getBytes("US-ASCII") ++ pixels)
    val s = Multimodal.decodeFrames(payload)
    assert(s.width == 2 && s.height == 2 && s.nFrames == 1)
    assert(s.pixelSum == pixels.map(b => (b & 0xff).toLong).sum)
  }

  test("malformed payloads refuse loudly with the byte offset") {
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodeFrames(bytes)).getMessage
    assert(msg("P5\n2 2\n255\n".getBytes("US-ASCII")).contains("magic"))
    assert(msg(Array.emptyByteArray).contains("empty payload"))
    // truncated pixel data
    assert(msg("P6\n4 4\n255\nxy".getBytes("US-ASCII")).contains("truncated"))
    // 2-byte maxval is valid PPM but not this 1-byte-sample subset
    assert(msg("P6\n1 1\n65535\nabc".getBytes("US-ASCII")).contains("maxval"))
    // trailing garbage after a valid frame = a corrupt next frame
    val good = Multimodal.encodePpmStream("hello world".getBytes("US-ASCII"), 1, 1, 1)
    assert(msg(good ++ "JUNK".getBytes("US-ASCII")).contains("magic"))
  }

  test("feature extraction preserves row count under repartitioning (batch-shape safety)") {
    val n8 = Multimodal.extractFeatures(media.repartition(8)).count()
    val n1 = Multimodal.extractFeatures(media.coalesce(1)).count()
    assert(n8 == n1)
  }

  test("frame sampling yields stride-2 indices below the DECODED n_frames") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats)
    val joined = frames.join(feats, "media_id")
      .select($"frame_idx", $"n_frames").collect()
    assert(joined.forall(r => r.getLong(0) < r.getLong(1)))
    assert(joined.forall(r => r.getLong(0) % 2 == 0))
  }

  test("zero-length source bytes still encode a valid (all-black) stream") {
    val one = Seq((1L, "", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(one)).head()
    // L=0: w=4, h=3, F=1 → one 11-byte header + 36 zero pixels
    assert(f.getAs[Long]("byte_len") == 47L)
    assert(f.getAs[Long]("pixel_sum") == 0L)
    assert(f.getAs[Double]("pixel_mean") == 0.0)
  }
}
