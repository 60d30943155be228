package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, partition-batch decode, frame sampling
  * (codec itself is a deterministic stub — see Multimodal). */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "", "en", "src1", 0L),
    (2L, "αβγ multibyte", "el", "src2", 13L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table keeps payloads as opaque binary with typed metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val row = media.filter($"media_id" === 0).collect()(0)
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("feature extraction runs per-partition and is deterministic") {
    val media = Multimodal.mediaFromDocuments(docs).repartition(3)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes == 11)
    assert(feats(0L).first_byte == 'h'.toInt)
    assert(feats(1L).n_bytes == 0 && feats(1L).first_byte == -1)
    // multibyte text: byte length > char length
    assert(feats(2L).n_bytes > 13)
    // run twice → identical (stub decode is deterministic)
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats == again)
  }

  test("frame sampling slices cover the payload exactly") {
    val media = Multimodal.mediaFromDocuments(docs.filter($"doc_id" === 0))
    val frames = Multimodal.sampleFrames(media, 4).orderBy("frame_idx").collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(new String(joined, "UTF-8") == "hello world")
  }
}
