package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(spark, docs)

  test("media table carries binary payloads with typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val row = media.orderBy("media_id").first()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[Map[String, String]]("meta").contains("lang"))
  }

  test("feature extraction is deterministic in the payload bytes") {
    val f = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f.length == docs.count())
    f.foreach { r =>
      val len = r.getAs[Long]("byte_len")
      assert(r.getAs[Long]("width") == 16 + len % 64)
      assert(r.getAs[Long]("n_frames") == 1 + len % 8)
    }
  }

  test("feature extraction preserves row count under repartitioning (batch-shape safety)") {
    val n8 = Multimodal.extractFeatures(media.repartition(8)).count()
    val n1 = Multimodal.extractFeatures(media.coalesce(1)).count()
    assert(n8 == n1)
  }

  test("frame sampling yields stride-2 indices below n_frames") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats)
    val joined = frames.join(feats, "media_id")
      .select($"frame_idx", $"n_frames").collect()
    assert(joined.forall(r => r.getLong(0) < r.getLong(1)))
    assert(joined.forall(r => r.getLong(0) % 2 == 0))
  }

  test("empty payload does not crash the decode stub") {
    val one = Seq((1L, Array.emptyByteArray, "x", Map.empty[String, String]))
      .toDF("media_id", "payload", "mime", "meta")
    val f = Multimodal.extractFeatures(one).collect()
    assert(f.head.getAs[Long]("byte_len") == 0L)
  }
}
