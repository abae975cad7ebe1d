package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic compressibility corpus — the fixture-truth oracle for the
 * `text_compress` gate (the MediaFixture move, applied to deflate): every
 * document is a pure function of its doc_id, planted in one of three
 * classes whose DEFLATE behavior is separated by construction, so the
 * gate can hash-check the keep/drop verdict and the class ORDERING
 * closed-form in any SQL engine while the deflate byte VALUES honestly
 * stay JVM-only (see the portability note on
 * [[graft.functions.DeflateKernel]]).
 *
 * Classes (doc_id % 3):
 *  - 0 `template`: one boilerplate sentence repeated 60x — the
 *    machine-generated-spam regime; deflate's window sees the whole
 *    period, ratio lands ~0.01-0.03, far under any sane cut.
 *  - 1 `prose`: 256 three-syllable pseudo-words from a 4096-word
 *    effective vocabulary plus a 4-hex-digit token every 8th word —
 *    natural-text entropy (~2 bits/char), ratio ~0.3-0.45.
 *  - 2 `noise`: 2048 chars drawn uniformly from a 64-symbol alphabet —
 *    the binary-spill regime at 6 bits/char, ratio ~0.75+.
 *
 * The bands are separated by >5x margins at every tested JVM, so the
 * cross-class ordering max(class c) < min(class c+1) and the
 * minRatio = 0.10 verdict (class 0 flagged, 1 and 2 kept) are stable
 * engine-invariant facts — exactly what the oracle asserts.
 *
 * Scale shape: generation is a narrow map over the ids frame (no
 * shuffle, no driver state); at a real lake the fixture is replaced by
 * the corpus itself and the downstream operator is unchanged.
 */
object TextFixture {

  /** splitmix64 finalizer (the MediaFixture/EbwScaling constant). */
  private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  private val Syllables = Array(
    "ba", "ce", "di", "fo", "gu", "han", "jel", "kim",
    "lor", "mun", "nep", "qua", "rit", "sol", "tam", "vex")

  private val NoiseAlphabet =
    ('a' to 'z').mkString + ('A' to 'Z').mkString + ('0' to '9').mkString + "+/"

  private[ops] def templateText(id: Long): String = {
    val sb = new StringBuilder(64 * 60 + 16)
    var i = 0
    while (i < 60) {
      sb.append("all boilerplate and no entropy makes deflate a short stream. ")
      i += 1
    }
    sb.append('#').append(id)
    sb.toString
  }

  private[ops] def proseText(id: Long): String = {
    val sb = new StringBuilder(2048)
    var i = 0
    while (i < 256) {
      val h = mix(id * 1000003L + i)
      sb.append(Syllables(((h >>> 8) & 15).toInt))
        .append(Syllables(((h >>> 16) & 15).toInt))
        .append(Syllables(((h >>> 24) & 15).toInt))
      if (i % 8 == 7) {
        sb.append(' ')
        sb.append(java.lang.Long.toHexString(0x1000L | ((h >>> 32) & 0xfff)).substring(0, 4))
      }
      sb.append(if (i % 16 == 15) ". " else " ")
      i += 1
    }
    sb.toString
  }

  private[ops] def noiseText(id: Long): String = {
    val sb = new StringBuilder(2048)
    var i = 0
    while (i < 2048) {
      val h = mix(id * 6364136223846793005L + i)
      sb.append(NoiseAlphabet(((h >>> 13) & 63).toInt))
      i += 1
    }
    sb.toString
  }

  /** (id, doc_class, text) — one planted document per input id. */
  def compressCorpus(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val cls = (((id % 3) + 3) % 3).toInt
      val text = cls match {
        case 0 => templateText(id)
        case 1 => proseText(id)
        case _ => noiseText(id)
      }
      (id, cls, text)
    }.toDF(idCol, "doc_class", "text")
  }

  /** Disjoint 16-word vocabularies for the planted quality corpus: every
   * token is class-specific, so ANY sane linear classifier trained on
   * one half predicts the other half's class with a wide margin — the
   * held-out argmax verdict is an engine-invariant fact even though the
   * trained float weights are aggregation-order-dependent. */
  private val GoodVocab = Array(
    "coherent", "reference", "article", "measured", "careful", "detailed",
    "sourced", "citation", "archive", "edited", "reviewed", "paragraph",
    "balanced", "thorough", "verified", "accurate")

  private val JunkVocab = Array(
    "zzwin", "xxfree", "qqcash", "jjclick", "kkbuy", "vvnow",
    "ppdeal", "ggwow", "hhspin", "ttloot", "rrgift", "bbpromo",
    "mmbonus", "nnclaim", "ddprize", "ssjackpot")

  private[ops] def qualityText(id: Long, cls: Int): String = {
    val v = if (cls == 1) GoodVocab else JunkVocab
    val sb = new StringBuilder(48 * 11)
    var i = 0
    while (i < 48) {
      val h = mix(id * 2862933555777941757L + i)
      if (i > 0) sb.append(' ')
      sb.append(v(((h >>> 7) & 15).toInt))
      i += 1
    }
    sb.toString
  }

  /** (id, doc_class, text) — planted quality corpus: class from bit 1 of
   * the id (`(id / 2) % 2`), ORTHOGONAL to the even/odd train/score
   * split, so both halves carry both classes. */
  def qualityCorpus(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val cls = ((id >> 1) % 2).toInt
      (id, cls, qualityText(id, cls))
    }.toDF(idCol, "doc_class", "text")
  }

  /**
   * The `text_quality_model` gate body — fixture-truth verdicts for the
   * LEARNED quality classifier: plant the corpus, TRAIN the portable
   * linear model ([[QualityClassifier.trainPortable]], real MLlib L-BFGS
   * over md5-bucket hashed TF) on the even-id half with the planted
   * class as the label, score the held-out odd half
   * ([[QualityClassifier.scoreLinear]]), and emit the per-doc CLASS
   * verdict. The disjoint vocabularies separate the classes by
   * construction, so the held-out verdict equals the planted class —
   * closed-form in any engine (`(id / 2) % 2`) — while the training
   * floats honestly stay JVM-side. Argmax over a wide margin is immune
   * to the aggregation-order float noise that keeps raw probabilities
   * out of hash gates.
   * Output: idCol (held-out ids only), doc_class, predicted_quality.
   */
  def qualityVerdicts(ids: DataFrame, idCol: String,
      buckets: Int = 1 << 16): DataFrame = {
    val corpus = qualityCorpus(ids, idCol)
    val train = corpus.filter(col(idCol) % 2 === 0)
      .select(col(idCol).cast("string").as("_qid"), col("text"),
        col("doc_class").cast("double").as("_lbl"))
    val (coeffs, b0) = QualityClassifier.trainPortable(train, "text",
      "_lbl", "_qid", buckets = buckets, maxIter = 25)
    val held = corpus.filter(col(idCol) % 2 === 1)
    QualityClassifier.scoreLinear(held, coeffs, b0, buckets, "text", idCol)
      .join(held.select(col(idCol), col("doc_class")), Seq(idCol))
      .select(col(idCol), col("doc_class"),
        (col("quality_prob") > 0.5).as("predicted_quality"))
  }

  /**
   * The `text_compress` gate body: plant the corpus, score it with the
   * real deflate kernel ([[TextMetrics.compressionRatio]], minRatio 0.10),
   * and emit per doc the engine-portable facts — the keep/drop verdict
   * and whether this doc's class band is wholly below the next class's
   * band. Expected closed form: too_repetitive = (doc_class = 0),
   * separated_from_next = (doc_class < 2).
   */
  def compressVerdicts(ids: DataFrame, idCol: String): DataFrame = {
    val corpus = compressCorpus(ids, idCol)
    val scored = TextMetrics.compressionRatio(corpus, "text", idCol, minRatio = 0.10)
      .join(corpus.select(col(idCol), col("doc_class")), Seq(idCol))
    val bands = scored.groupBy("doc_class")
      .agg(min("ratio").as("rmin"), max("ratio").as("rmax"))
    val next = bands.select((col("doc_class") - 1).as("doc_class"),
      col("rmin").as("next_rmin"))
    // 3-row band table: broadcast join back onto the per-doc verdicts
    val sep = bands.join(next, Seq("doc_class"), "left")
      .select(col("doc_class"),
        coalesce(col("rmax") < col("next_rmin"), lit(false))
          .as("separated_from_next"))
    scored.select(col(idCol), col("doc_class"), col("too_repetitive"))
      .join(broadcast(sep), Seq("doc_class"))
      .select(col(idCol), col("doc_class"), col("too_repetitive"),
        col("separated_from_next"))
  }
}
