package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata, processed in partition-sized
 * batches (the Scala analogue of mapInPandas batching). The actual codec
 * decode is STUBBED — this container ships no image/audio libraries — with
 * a deterministic fake that derives "features" from the payload bytes, so
 * the Spark-side schema, batching, partitioning, and UDF signatures are
 * real and tested while the pixel math is swappable.
 */
object Multimodal {

  case class MediaRecord(id: Long, payload: Array[Byte])
  case class MediaFeatures(
      id: Long, n_bytes: Long, format: String, features: Array[Float])

  /** STUB decode: sniffs a "format" from magic bytes and emits a
   * deterministic feature vector from a rolling hash of the payload.
   * Swap this single function for a real codec on a cluster with codecs. */
  private[ops] def decodeStub(payload: Array[Byte], dim: Int): (String, Array[Float]) = {
    val format =
      if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
      else if (payload.length >= 4 && payload(0) == 0x89.toByte && payload(1) == 'P') "png"
      else "raw"
    val feats = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      feats(i % dim) += (h % 1000L) / 1000.0f
      i += 1
    }
    (format, feats)
  }

  /** Batched feature extraction over a binary column. One narrow
   * mapPartitions pass — rows are processed in partition batches exactly
   * like an Arrow-batched pandas UDF, no shuffle, no driver involvement. */
  def extractFeatures(
      df: DataFrame, idCol: String, binaryCol: String, dim: Int = 16): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binaryCol).as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (fmt, feats) = decodeStub(payload, dim)
          MediaFeatures(r.id, payload.length.toLong, fmt, feats)
        }
      }
  }

  /** Frame-sampling plumbing for "video": split a payload into fixed-size
   * chunks (stand-in for frames), explode to one row per sampled frame. */
  def sampleFrames(
      df: DataFrame, idCol: String, binaryCol: String,
      frameBytes: Int = 256, everyNth: Int = 4): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binaryCol).as("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        val nFrames = math.max(1, payload.length / frameBytes)
        (0 until nFrames by everyNth).map { f =>
          val from = f * frameBytes
          val until = math.min(payload.length, from + frameBytes)
          (r.id, f, java.util.Arrays.copyOfRange(payload, from, until))
        }
      }
      .toDF(idCol, "frame_idx", "frame_payload")
  }
}
