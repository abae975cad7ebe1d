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
  /** Typed metadata sniffed from the container headers (REAL parsing, no
   * codec needed): -1 marks fields a format does not carry. */
  case class MediaMeta(
      id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, channels: Int, sample_rate: Int)

  /**
   * Parse real container headers from the leading bytes — pure JVM, no
   * codec libraries: PNG IHDR, JPEG SOF marker scan, GIF/BMP fixed
   * headers, RIFF/WAVE fmt-chunk scan. Only the PIXEL/SAMPLE decode is
   * stubbed in this container; dimensions, channel counts, and sample
   * rates are genuinely extracted, so schema inference and
   * partition-pruning pipelines over media tables are fully real.
   * Malformed/truncated payloads degrade to ("raw", -1, ...) — never throw.
   */
  private[ops] def sniffMeta(p: Array[Byte]): (String, Int, Int, Int, Int) = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, n: Int): String =
      if (i + n <= p.length) new String(p, i, n, "US-ASCII") else ""
    try {
      if (p.length >= 26 && u8(0) == 0x89 && ascii(1, 3) == "PNG") {
        // IHDR is always first: width/height BE at 16/20, color type at 25
        val channels = u8(25) match {
          case 0 => 1 // greyscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette
          case 4 => 2 // grey + alpha
          case 6 => 4 // truecolor + alpha
          case _ => -1
        }
        ("png", be32(16), be32(20), channels, -1)
      } else if (p.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk the marker stream to the first SOFn frame header
        var i = 2
        var out: (String, Int, Int, Int, Int) = ("jpeg", -1, -1, -1, -1)
        var done = false
        while (!done && i + 9 < p.length) {
          if (u8(i) != 0xff) { done = true }
          else {
            val m = u8(i + 1)
            val isSof = (m >= 0xc0 && m <= 0xcf) &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              out = ("jpeg", be16(i + 7), be16(i + 5), u8(i + 9), -1)
              done = true
            } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
              i += 2 // standalone marker, no length
            } else i += 2 + be16(i + 2)
          }
        }
        out
      } else if (p.length >= 10 && (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a")) {
        ("gif", le16(6), le16(8), 3, -1)
      } else if (p.length >= 26 && ascii(0, 2) == "BM") {
        ("bmp", le32(18), le32(22), 3, -1)
      } else if (p.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
        // chunk scan for "fmt ": channels LE16 at +10, rate LE32 at +12.
        // Malformed (negative/zero-advance) chunk sizes abort the scan —
        // a corrupt blob must degrade, never hang the task or throw.
        var i = 12
        var out: (String, Int, Int, Int, Int) = ("wav", -1, -1, -1, -1)
        var done = false
        while (!done && i + 16 <= p.length) {
          val id = ascii(i, 4)
          val sz = le32(i + 4)
          if (id == "fmt ") {
            out = ("wav", -1, -1, le16(i + 10), le32(i + 12))
            done = true
          } else if (sz < 0) done = true
          else i += 8 + sz + (sz & 1)
        }
        out
      } else ("raw", -1, -1, -1, -1)
    } catch {
      // covers ArrayIndexOutOfBounds AND StringIndexOutOfBounds from
      // adversarial offsets
      case _: IndexOutOfBoundsException => ("raw", -1, -1, -1, -1)
    }
  }

  /** Batched metadata extraction: one narrow mapPartitions pass parsing
   * real container headers (see sniffMeta). */
  def extractMetadata(
      df: DataFrame, idCol: String, binaryCol: String): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binaryCol).as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val payload = if (r.payload == null) Array.empty[Byte] else r.payload
          val (fmt, w, h, ch, rate) = sniffMeta(payload)
          MediaMeta(r.id, payload.length.toLong, fmt, w, h, ch, rate)
        }
      }
  }

  /** STUB decode: sniffs a "format" from magic bytes and emits a
   * deterministic feature vector from a rolling hash of the payload.
   * Swap this single function for a real codec on a cluster with codecs. */
  private[ops] def decodeStub(payload: Array[Byte], dim: Int): (String, Array[Float]) = {
    val format = sniffMeta(payload)._1
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
