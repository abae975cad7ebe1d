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
}
