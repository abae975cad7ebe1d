package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** multimodal media gates (perceptual dedup, header metadata) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesMm {

  /** Media corpora persist ONCE per (process, sfDir) — the
   * dedup_minhash_incr precedent: production media arrives FROM STORAGE,
   * so the gates read the fixture back from parquet and time the
   * operator (real decode, banding, header parse), not the synthetic
   * PNG/WAV ENCODE that exists only to avoid shipping binary fixtures.
   * The encode had been ~half the mm_video_dedup wall time. */
  private val mediaPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def persistedCorpus(s: SparkSession, dir: String, kind: String,
      gen: (SparkSession, DataFrame) => DataFrame): DataFrame = {
    val p = mediaPaths.computeIfAbsent(s"$kind|$dir", _ => {
      val path = graft.ops.Scratch.dir(s"graft_media_$kind") + "/corpus"
      // write well-partitioned (one file per core): the documents table
      // is small enough to read as ONE split, and a 1-file corpus would
      // hand the whole decode mapPartitions to a single task — a layout
      // problem, not an operator one (production media tables arrive as
      // many objects; parquet can't split a file below file level)
      gen(s, t(s, dir, "documents").select("doc_id"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(p)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_image_dedup" -> ((s, dir) => {
      // perceptual image dedup end-to-end on the deterministic PNG
      // corpus (one image per doc_id; variant 1 of each 3-id group is
      // the SAME scene at half resolution — the planted near-dup that
      // byte-level dedup can never see). dHash over real ImageIO
      // decodes, pigeonhole-banded hamming pairs; the decode/pairing
      // semantics are spec-anchored (dHash + imageNearDupPairs specs).
      // FIXTURE-TRUTH
      // ORACLE: the planted truth is closed-form on doc_ids — pair
      // (3g, 3g+1) whenever both ids exist, at EXACTLY hamming 0 (the
      // half-res variant area-averages to bit-identical dHash cells:
      // constant gray per grid cell makes both resolutions' cell means
      // the same FP value) — so DuckDB replays the full expected output
      // from the documents table alone. Valid while max doc_id <
      // 3·100000 (the variant-2 scene offset; past it a v2 scene
      // collides with a later group's v0 — sf0.01/sf0.1 are far under)
      val imgs = persistedCorpus(s, dir, "image",
        graft.ops.MediaFixture.images)
      graft.ops.Multimodal.imageNearDupPairs(imgs, "id", "payload",
          maxHamming = 3, bands = 4)
        .orderBy("id_a", "id_b")
    }),
    "mm_audio_dedup" -> ((s, dir) => {
      // perceptual audio dedup on the deterministic WAV corpus (variant
      // 1 = same envelope at half gain — invisible to byte hashing);
      // envelope fingerprints over real PCM decodes, banded hamming.
      // FIXTURE-TRUTH ORACLE on the pair STRUCTURE: (3g, 3g+1)
      // whenever both ids exist — closed-form on doc_ids like
      // mm_image_dedup. The hamming VALUE is projected away: 16-bit
      // PCM quantization means the half-gain variant's RMS envelope is
      // not bit-exactly half, so a near-tied adjacent block pair could
      // legitimately flip a comparison (0 < hamming <= 4) — pair
      // membership is construction-guaranteed, the exact distance is
      // not, and an oracle must only assert what construction pins
      val clips = persistedCorpus(s, dir, "audio",
        graft.ops.MediaFixture.audio)
      graft.ops.Multimodal.audioNearDupPairs(clips, "id", "payload",
          maxHamming = 4, bands = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),
    "mm_video_dedup" -> ((s, dir) => {
      // frame-sampled video near-dup end-to-end on the deterministic
      // concatenated-PNG corpus (6 frames per doc_id; variant 1 of each
      // 3-id group re-encodes every frame at half resolution — the
      // same-content re-encode byte dedup can never see). REAL per-frame
      // ImageIO decodes on a 1-in-2 frame sample, majority-vote 64-bit
      // video signature, pigeonhole-banded hamming pairs. FIXTURE-TRUTH
      // ORACLE: pair (3g, 3g+1) at EXACTLY hamming 0 — the fixture's
      // piecewise-constant texture grid makes each frame's dHash
      // bit-identical across resolutions, so the majority vote is too
      // (same validity window as mm_image_dedup: max doc_id < 3e5)
      val vids = persistedCorpus(s, dir, "video",
        graft.ops.MediaFixture.videos)
      graft.ops.Multimodal.videoNearDupPairs(vids, "id", "payload",
          maxHamming = 3, bands = 4, everyNth = 2)
        .orderBy("id_a", "id_b")
    }),
    "mm_media_meta" -> ((s, dir) => {
      // container-header metadata profile over a mixed PNG/WAV corpus:
      // per-format counts + dimension/channel/rate aggregates from the
      // real header parse (the lakehouse media-catalog audit).
      // FIXTURE-TRUTH ORACLE: every aggregated field is construction-
      // determined (even ids are 72x48 or 36x24 RGB PNGs, odd ids are
      // mono 8 kHz WAVs), so DuckDB replays the expected profile from
      // doc_ids alone. Encoded byte totals are deliberately NOT in the
      // gate (PNG length is deflate-dependent — no SQL form; payload
      // sizing stays spec-anchored)
      val mixed = persistedCorpus(s, dir, "mixed",
        graft.ops.MediaFixture.mixed)
      graft.ops.Multimodal.extractMetadata(mixed, "id", "payload").toDF()
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          round(avg(when(col("width") > 0, col("width"))), 4)
            .as("avg_width"),
          round(avg(when(col("height") > 0, col("height"))), 4)
            .as("avg_height"),
          round(avg(when(col("channels") > 0, col("channels"))), 4)
            .as("avg_channels"),
          round(avg(when(col("sample_rate") > 0, col("sample_rate"))), 4)
            .as("avg_rate"))
        .orderBy("format")
    }),
  )

  val oracles: Map[String, String] = Map(
    // mm_* fixture-truth oracles: the media corpus is a pure function
    // of doc_id (MediaFixture scaladoc), so the EXPECTED engine output
    // is closed-form on the documents table — the planted (3g, 3g+1)
    // near-dup pair per group, and the per-format header profile.
    // These gate real decode + banding end-to-end: a wrong PCM/pixel
    // decode, a lossy band join, or a header mis-parse all diverge
    // from the construction truth.
    "mm_image_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 3 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "mm_audio_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 3 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "mm_video_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 3 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "mm_media_meta" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN doc_id % 3 = 1 THEN 36 ELSE 72 END END AS width,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN doc_id % 3 = 1 THEN 24 ELSE 48 END END AS height,
        |    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS channels,
        |    CASE WHEN doc_id % 2 = 1 THEN 8000 END AS rate
        |  FROM documents)
        |SELECT format, count(*)::BIGINT AS n,
        |  round(avg(width), 4) AS avg_width,
        |  round(avg(height), 4) AS avg_height,
        |  round(avg(channels), 4) AS avg_channels,
        |  round(avg(rate), 4) AS avg_rate
        |FROM m GROUP BY format ORDER BY format""".stripMargin,
  )
}
