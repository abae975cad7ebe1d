package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic binary-media corpus, generated DISTRIBUTEDLY from the
 * `documents` table's doc_ids — the gate fixture for the perceptual
 * image/audio dedup tier ([[Multimodal.imageNearDupPairs]] /
 * [[Multimodal.audioNearDupPairs]]).
 *
 * Why generated: the driver testdata ships no binary-media table, and
 * the perceptual tier's semantics live in DECODED pixels/samples, not
 * in any particular byte stream — so the corpus encodes real codec
 * bytes (JDK ImageIO PNG; hand-assembled RIFF/PCM WAV, the same
 * encoders the specs prove the decoders against) from a deterministic
 * per-id scene function. Every payload is a pure function of its
 * doc_id: the corpus is identical across runs, partitionings, and
 * scale factors (sf0.1 simply has 10x the doc_ids).
 *
 * Scene scheme (groups of 3 consecutive ids): variant 0 is the scene
 * at full resolution, variant 1 is the SAME scene at half resolution
 * (images) / half gain (audio) — a planted perceptual near-dup that
 * byte-level dedup can never see — and variant 2 is a genuinely
 * different scene. The expected pair structure is therefore one
 * (v0, v1) pair per complete group and nothing across groups.
 *
 * Scale shape: generation is a narrow `map` over the ids frame (no
 * shuffle, no driver loop — encoding runs on executors); downstream
 * the dedup operators' banded-hamming join does the real work. At a
 * real 100 TB media lake this generator is replaced by the lake's own
 * (id, payload) binary column — everything after the map is identical.
 */
object MediaFixture {

  /** splitmix64 finalizer — full-entropy scene randomness, so DISTINCT
   * scenes land ~32 Hamming bits apart in both perceptual hash spaces
   * (a weak low-entropy scene function collides scenes at hamming 0 and
   * drowns the planted near-dups in false pairs). */
  private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  /** Deterministic RGB scene: a random gray texture per scene,
   * piecewise-constant over the dHash 9×8 cell grid (8×6-px cells in
   * FULL-resolution 72×48 pixel space; the half-res encoder passes
   * step=2). 72 and 48 divide evenly by the 9×8 grid, so the grid
   * boundaries land on the SAME texture-cell edges at both resolutions
   * and the two variants area-average to identical cell values — the
   * planted near-dup sits at hamming ~0 while distinct scenes draw
   * independent cells (~32 bits apart; measured cross-scene minimum
   * 20 on 40 scenes, far above the cut). */
  private def rgbAt(scene: Long, x: Int, y: Int): Int = {
    val g = (mix(scene * 8191L + (x / 8) * 127L + (y / 6)) & 0xff).toInt
    (g << 16) | (g << 8) | g
  }

  private def encodePng(w: Int, h: Int, scene: Long, step: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rgbAt(scene, x * step, y * step))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeWav16(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic amplitude envelope per scene — piecewise-constant
   * loudness over 65 blocks (matching [[Multimodal.audioHash]]'s
   * 65-window RMS envelope), each block's amplitude an independent
   * draw per scene, on a fixed sine carrier. Uniform gain preserves
   * every window comparison (the planted near-dup); distinct scenes
   * draw independent envelopes. */
  private def sampleAt(scene: Long, i: Int, n: Int): Double = {
    val block = (i.toLong * 65) / n
    val amp = 0.1 + 0.9 * ((mix(scene * 131L + block) & 0xffff) / 65535.0)
    math.sin(i * 0.3) * amp
  }

  private def wav(scene: Long, gain: Double): Array[Byte] =
    encodeWav16(8000, Array.tabulate(4000)(i =>
      (sampleAt(scene, i, 4000) * gain * 32000).toShort))

  private def imagePayload(id: Long): Array[Byte] = {
    val scene = id / 3
    (id % 3) match {
      case 0 => encodePng(72, 48, scene, 1)
      case 1 => encodePng(36, 24, scene, 2) // same scene, half resolution
      case _ => encodePng(72, 48, scene + 100000L, 1) // different scene
    }
  }

  private def audioPayload(id: Long): Array[Byte] = {
    val scene = id / 3
    (id % 3) match {
      case 0 => wav(scene, 1.0)
      case 1 => wav(scene, 0.5) // same envelope, half gain
      case _ => wav(scene + 100000L, 1.0) // different envelope
    }
  }

  /** Deterministic "video": 6 concatenated PNG frames, frame f of group
   * g drawing scene g*31+f (adjacent frames are DISTINCT scenes — the
   * sampler must not depend on inter-frame similarity). Variant 1
   * re-encodes every frame at half resolution (the same-content
   * re-encode byte hashing can never see); the piecewise-constant
   * texture grid makes each frame's dHash bit-identical across
   * resolutions (the [[rgbAt]] argument), so the majority-vote video
   * signature matches at hamming 0 by construction. Variant 2 draws a
   * disjoint scene range. */
  private def videoPayload(id: Long): Array[Byte] = {
    val group = id / 3
    val (base, step) = (id % 3) match {
      case 0 => (group * 31L, 1)
      case 1 => (group * 31L, 2)
      case _ => ((group + 100000L) * 31L, 1)
    }
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < 6) {
      bos.write(encodePng(72 / step, 48 / step, base + f, step))
      f += 1
    }
    bos.toByteArray
  }

  /** (id, payload) concatenated-PNG "video" corpus — one clip per
   * input doc_id. */
  def videos(spark: SparkSession, ids: DataFrame): DataFrame =
    corpus(spark, ids, videoPayload)

  private def corpus(spark: SparkSession, ids: DataFrame,
      gen: Long => Array[Byte]): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, gen(id)))
      .toDF("id", "payload")
  }

  /** (id, payload) PNG corpus — one image per input doc_id. */
  def images(spark: SparkSession, ids: DataFrame): DataFrame =
    corpus(spark, ids, imagePayload)

  /** (id, payload) 16-bit PCM WAV corpus — one clip per input doc_id. */
  def audio(spark: SparkSession, ids: DataFrame): DataFrame =
    corpus(spark, ids, audioPayload)

  /** Mixed-format corpus (PNG on even ids, WAV on odd) for the
   * metadata-extraction profile. */
  def mixed(spark: SparkSession, ids: DataFrame): DataFrame =
    corpus(spark, ids,
      id => if (id % 2 == 0) imagePayload(id) else audioPayload(id))
}
