package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, processed per-partition in batches.
  *
  * The Spark side (schema, partition-parallel batch decode, feature
  * extraction shape) is real and tested; the codec itself is a
  * clearly-marked STUB (this container has no image/audio libraries) —
  * `decodeStub` derives deterministic fake features from the bytes, and
  * a production deployment swaps in a real decoder without touching the
  * plan shape.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); `mapPartitions` amortizes per-batch codec setup (the same
  * reason Python pipelines use mapInPandas); feature output is a flat
  * struct so downstream ops are columnar again.
  */
object Multimodal {

  /** Media-table schema: id + opaque payload + declared type + metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("source", StringType, nullable = true)))

  /** Build a media table from the documents fixture: the utf-8 bytes of
    * `text` stand in for an encoded image payload. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"),
      col("source"))

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      first_byte: Int,
      byte_checksum: Long,
      width: Int,
      height: Int)

  /** STUB decoder: a real implementation would hand `payload` to an
    * image codec here. The fake derives deterministic pseudo-features
    * (length, first byte, additive checksum, fake dimensions) so the
    * surrounding distributed plumbing is fully exercisable. */
  private def decodeStub(mediaId: Long, payload: Array[Byte]): MediaFeatures = {
    // ??? <- real codec call site (e.g. ImageIO.read / ffmpeg bindings)
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = mediaId,
      n_bytes = payload.length,
      first_byte = if (payload.nonEmpty) payload(0) & 0xff else -1,
      byte_checksum = sum,
      width = (sum % 640).toInt,
      height = (sum % 480).toInt)
  }

  /** Batch feature extraction: one decoder instantiation per partition,
    * rows processed in a tight loop (the mapInPandas analog). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (stub: none)
        rows.map { case (id, payload) => decodeStub(id, payload) }
      }
  }

  /** Frame sampling stub for video payloads: emits `n` deterministic
    * byte-slices per payload (a real impl samples decoded frames).
    * Output: (media_id, frame_idx, frame_bytes). */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val len = math.max(payload.length, 1)
        (0 until n).map { f =>
          val start = (len.toLong * f / n).toInt
          val end = (len.toLong * (f + 1) / n).toInt
          (id, f, payload.slice(start, end))
        }
      }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
