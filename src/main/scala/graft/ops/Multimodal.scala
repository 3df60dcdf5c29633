package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * batched `mapPartitions` pass (the JVM analog of `mapInPandas` —
  * one iterator per partition, amortized per-batch setup, executor-
  * parallel, no driver round-trips).
  *
  * The actual codec step is a STUB — image/audio libraries are not in
  * this container — marked clearly in [[decodeStub]]. It is a
  * deterministic function of the bytes so the Spark-side plumbing
  * (schema, partitioning, batch shape) is fully testable and
  * oracle-comparable; swap [[decodeStub]] for a real decoder (JavaCV,
  * TwelveMonkeys, …) to productionize.
  */
object Multimodal {

  /** Schema of a media table: id + payload + mime + free-form metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("mime", StringType, nullable = true)))

  /** STUB decoder ??? — stands in for a real image/audio codec, which is
    * unavailable in this environment. Deterministic in the payload bytes
    * (length + first byte) so tests and oracles can predict its output.
    */
  private[ops] def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val len = payload.length.toLong
    val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else 0L
    val width = 16L + len % 64L
    val height = 16L + first % 64L
    val nFrames = 1L + len % 8L
    (width, height, nFrames)
  }

  /** Batched feature extraction over the binary payloads. Each partition
    * is processed with a single iterator pass (the real-codec version
    * would allocate its decoder once per partition here, not per row).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    val mimeIdx = media.schema.fieldIndex("mime")
    val out: Dataset[Row] = media.mapPartitions { rows =>
      // per-partition setup for the (stubbed) decoder lives HERE
      rows.map { r =>
        val payload = if (r.isNullAt(payIdx)) Array.emptyByteArray else r.getAs[Array[Byte]](payIdx)
        val (w, h, f) = decodeStub(payload)
        Row(r.getLong(idIdx), payload.length.toLong, w, h, f,
          if (r.isNullAt(mimeIdx)) null else r.getString(mimeIdx))
      }
    }(enc)
    out.toDF()
  }

  /** Build a synthetic media table from the documents corpus (text bytes
    * as payload) — the shape real pipelines use for images/audio, with
    * data this environment actually has.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      concat(lit("text/plain;src="), col("source")).as("mime"),
      map(lit("lang"), col("lang"), lit("n_chars"), col("n_chars").cast(StringType)).as("meta"))

  /** Frame sampling plan for video-like payloads: every `stride`-th
    * frame index up to n_frames, as (media_id, frame_idx) rows — the
    * explode pattern a real frame-extraction pipeline partitions on.
    */
  def sampleFrames(features: DataFrame, stride: Int = 2): DataFrame =
    features.select(
      col("media_id"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
}
