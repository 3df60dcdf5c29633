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

  // ---- WAV PCM (round 12): the second real codec ---------------------------

  test("WAV round-trip: decoded stats match an independent recomputation") {
    val expected = docs.collect().map { r =>
      val bytes = r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val l = bytes.length
      val sr = 8000 + (l % 5) * 1000
      val ch = 1 + l % 2
      val s0 = (l + 1) / 2
      val s = s0 + ((ch - s0 % ch) % ch)
      def byteAt(j: Int): Int = if (j < l) bytes(j) & 0xff else 0
      val samples = (0 until s).map { i =>
        val v = byteAt(2 * i) | (byteAt(2 * i + 1) << 8)
        if (v >= 32768) v - 65536 else v
      }
      r.getAs[Long]("doc_id") ->
        ((44L + s * 2, sr.toLong, ch.toLong, (s / ch).toLong,
          (s / ch).toLong * 1000000L / sr,
          samples.map(v => math.abs(v).toLong).sum,
          if (samples.isEmpty) 0L else samples.map(v => math.abs(v).toLong).max))
    }.toMap
    val feats = Multimodal
      .extractAudioFeatures(Multimodal.audioFromDocuments(docs)).collect()
    assert(feats.length == expected.size)
    feats.foreach { r =>
      val (bl, sr, ch, fr, du, as_, pk) = expected(r.getAs[Long]("media_id"))
      assert(r.getAs[Long]("byte_len") == bl)
      assert(r.getAs[Long]("sample_rate") == sr && r.getAs[Long]("channels") == ch)
      assert(r.getAs[Long]("n_frames") == fr && r.getAs[Long]("duration_us") == du)
      assert(r.getAs[Long]("abs_sum") == as_, s"abs_sum of ${r.getAs[Long]("media_id")}")
      assert(r.getAs[Long]("peak") == pk)
      assert(r.getAs[String]("mime").startsWith("audio/wav"))
    }
  }

  test("the WAV parser skips unknown chunks and honors the odd-size pad byte") {
    val base = Multimodal.encodeWavPcm(Array[Byte](1, 2, 3, 4), 8000, 1)
    // splice an odd-sized LIST chunk (3 bytes + 1 pad) between fmt and data
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val extra = "LIST".getBytes(ascii) ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](7, 8, 9, 0) // size 3, padded to 4
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    // fix the RIFF size for the inserted bytes
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte; spliced(7) = ((sz >> 24) & 0xff).toByte
    val s = Multimodal.decodeWav(spliced)
    assert(s.sampleRate == 8000 && s.channels == 1 && s.nFrames == 2L)
    // samples: 0x0201=513, 0x0403=1027
    assert(s.absSum == 513L + 1027L && s.peak == 1027)
  }

  test("malformed WAV payloads refuse loudly (the real-decoder contract)") {
    val good = Multimodal.encodeWavPcm(Array[Byte](1, 2, 3, 4), 8000, 1)
    def corrupt(f: Array[Byte] => Array[Byte]): Unit = {
      val bad = f(good.clone())
      intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    }
    corrupt { b => b(0) = 'X'; b } // wrong RIFF magic
    corrupt { b => b(8) = 'X'; b } // wrong WAVE form
    corrupt { b => b(20) = 3; b } // IEEE-float format tag, not PCM
    corrupt { b => b(34) = 8; b } // 8-bit samples unsupported
    corrupt(b => b.dropRight(1)) // truncated data chunk (RIFF size disagrees)
    corrupt(b => b.slice(0, 36) ++ b.slice(36, b.length) ++ b.slice(36, b.length)) // 2nd data
    intercept[IllegalArgumentException](Multimodal.decodeWav(Array.emptyByteArray))
  }

  test("negative samples decode signed: 0xFFFF is -1, not 65535") {
    val payload = Multimodal.encodeWavPcm(Array[Byte](-1, -1, 0, -128), 8000, 1)
    val s = Multimodal.decodeWav(payload)
    // 0xFFFF → -1 (|v|=1); 0x8000 → -32768
    assert(s.absSum == 1L + 32768L && s.peak == 32768)
  }

  test("stereo pads to whole frames; empty data is a valid zero-duration WAV") {
    // 3 source bytes → 2 samples, padded to 2 (one stereo frame)
    val st = Multimodal.decodeWav(Multimodal.encodeWavPcm(Array[Byte](1, 2, 3), 44100, 2))
    assert(st.channels == 2 && st.nFrames == 1L)
    val empty = Multimodal.decodeWav(Multimodal.encodeWavPcm(Array.emptyByteArray, 8000, 1))
    assert(empty.nFrames == 0L && empty.absSum == 0L && empty.peak == 0)
  }
}
