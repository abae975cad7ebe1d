package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-based document quality scoring — the fastText-classifier stage of
 * the LLaMA / RedPajama / FineWeb-Edu lineage, where a linear classifier
 * over hashed bag-of-words features is trained on weak labels ("looks
 * like a reference page" vs "looks like crawl noise") and its positive
 * probability becomes the per-document quality score that thresholds or
 * buckets the corpus. This is the learned complement to the rule-based
 * signals ([[TextMetrics.gopherQuality]], [[TextMetrics.c4Rules]]) and the
 * count-based ones ([[TextMetrics.bigramLogProb]], [[TextMetrics.dsirWeights]]).
 *
 * Representation: hashed term frequencies (`HashingTF` over a lowercased
 * whitespace tokenization) — the DSIR trick again: the feature space is
 * `buckets` wide no matter the vocabulary, so the model is a fixed-size
 * coefficient vector that ships to executors as a broadcast, and scoring
 * is one narrow map over the corpus. Training is MLlib logistic
 * regression: each L-BFGS iteration is one treeAggregate over the
 * featurized corpus with `buckets`-dimensional driver state — the same
 * shuffle-free iteration shape as the EBW solver, so it scales the same
 * way (state bounded by feature width, never by corpus size).
 *
 * Training floats depend on aggregation order, so this operator is
 * spec-verified (separation + held-out accuracy) rather than
 * DuckDB-replayed; the gate registers rows-only.
 */
object QualityClassifier {

  /** Trained scorer: the LR model plus the feature-hash width it was
   * trained with (scoring MUST featurize with the same width). */
  final case class QualityModel(lr: LogisticRegressionModel, buckets: Int)

  private def featurize(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val tok = docs.withColumn("__q_tok",
      filter(split(lower(col(textCol)), "\\s+"), x => x =!= ""))
    new HashingTF()
      .setInputCol("__q_tok").setOutputCol("__q_feat")
      .setNumFeatures(buckets)
      .transform(tok)
  }

  /**
   * Fit on a weakly-labeled frame (`labelCol` ∈ {0, 1}; 1 = high
   * quality). Small default `regParam` keeps hash-collision noise from
   * being memorized; `standardization=false` because TF counts are
   * already commensurate.
   */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 1e-4): QualityModel = {
    require(buckets > 0, "buckets must be positive")
    val f = featurize(labeled, textCol, buckets)
      .withColumn("__q_lbl", col(labelCol).cast("double"))
    val lr = new LogisticRegression()
      .setFeaturesCol("__q_feat").setLabelCol("__q_lbl")
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false)
    QualityModel(lr.fit(f), buckets)
  }

  /** Score a corpus: positive-class probability (rounded 4dp) plus the
   * hard 0/1 verdict. One narrow map — no shuffle, no action. */
  def score(model: QualityModel, docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    model.lr.transform(featurize(docs, textCol, model.buckets))
      .select(col(idCol),
        round(element_at(vector_to_array(col(model.lr.getProbabilityCol)),
          2), 4).as("quality_prob"),
        col(model.lr.getPredictionCol).cast("long").as("quality_label"))

  /** Tokenize + md5-bucket a corpus — the PORTABLE feature space shared
   * by [[scoreLinear]] and [[trainPortable]] (and the
   * [[TextMetrics.dsirWeights]] oracle): space-split tokens, each
   * hashed by `pmod(md5-prefix, buckets)`. Unlike `HashingTF`'s
   * murmur3 (a JVM-private hash no SQL engine replays), this chain
   * runs verbatim in DuckDB, so a linear model scored through it is
   * oracle-checkable end to end. Output: idCol, b (bucket), tf. */
  private def bucketTf(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    // no FanOut: this featurization sits inside trainPortable's
    // iterative optimizer loop, where an extra exchange is paid per
    // re-evaluation (r18 measured text_quality_model +1 s with it)
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), " ", -1)).as("t"))
      .filter(col("t") =!= "")
      .withColumn("b",
        pmod(conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"),
          lit(buckets.toLong)))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /**
   * Portable linear scoring — the deployment half of the classifier
   * with NO opaque state: quality = σ(intercept + Σ_b tf_b · w_b) over
   * the md5-bucket hashed-TF features of [[bucketTf]]. The model is a
   * plain (b, w) frame — k rows, one per OCCUPIED bucket, missing
   * buckets weigh 0 — so the same literal table drives this scorer and
   * a SQL replay: training floats are aggregation-order-dependent (the
   * reason `score` registers rows-only), but scoring a FIXED model is
   * pure arithmetic, and this path makes it hash-gateable.
   *
   * Scale shape: one token explode + (doc, bucket) partial-aggregated
   * count, a broadcast join against the k-row weight table (a model is
   * ≤ buckets rows, never corpus-scale), one doc-keyed sum. Docs with
   * ZERO tokens never enter the explode and are restored by a left
   * join — an empty document scores σ(intercept), not a dropped row.
   * Output: idCol, n_tokens, quality_prob (4dp).
   */
  def scoreLinear(docs: DataFrame, coeffs: DataFrame, intercept: Double,
      buckets: Int, textCol: String, idCol: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val scored = bucketTf(docs, textCol, idCol, buckets)
      .join(broadcast(coeffs.select(col("b"), col("w"))), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * coalesce(col("w"), lit(0.0))).as("_z"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(lit(1.0) / (lit(1.0) +
            exp(-(lit(intercept) + coalesce(col("_z"), lit(0.0))))), 4)
          .as("quality_prob"))
  }

  /**
   * Train in the PORTABLE feature space: MLlib logistic regression over
   * [[bucketTf]] features, returning the (b, w) coefficient frame +
   * intercept that [[scoreLinear]] (and its SQL replay) consume — one
   * hash space from fit to deployment, unlike [[train]]'s murmur3
   * `HashingTF` which no external engine can reproduce. The per-doc
   * sparse vectors are assembled in a typed map (k = buckets bounds
   * the width); LR iterations are the same treeAggregate shape as
   * [[train]]. Coefficients come back as a `buckets`-capped frame of
   * NONZERO weights.
   */
  def trainPortable(labeled: DataFrame, textCol: String, labelCol: String,
      idCol: String, buckets: Int = 1 << 16, maxIter: Int = 50,
      regParam: Double = 1e-4): (DataFrame, Double) = {
    require(buckets > 0, "buckets must be positive")
    val spark = labeled.sparkSession
    import spark.implicits._
    val feats = bucketTf(labeled, textCol, idCol, buckets)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("b"), col("tf"))).as("_bt"))
      .join(labeled.select(col(idCol),
        col(labelCol).cast("double").as("__q_lbl")), Seq(idCol))
      .select(col(idCol), col("__q_lbl"), col("_bt"))
      .as[(String, Double, Seq[(Long, Double)])]
      .map { case (id, y, bt) =>
        val sorted = bt.sortBy(_._1)
        (id, y, org.apache.spark.ml.linalg.Vectors.sparse(buckets,
          sorted.map(_._1.toInt).toArray, sorted.map(_._2).toArray))
      }
      .toDF(idCol, "__q_lbl", "__q_feat")
    val lr = new LogisticRegression()
      .setFeaturesCol("__q_feat").setLabelCol("__q_lbl")
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false)
      .fit(feats)
    val co = lr.coefficients.toArray.zipWithIndex
      .collect { case (w, b) if w != 0.0 => (b.toLong, w) }.toSeq
      .toDF("b", "w")
    (co, lr.intercept)
  }
}
