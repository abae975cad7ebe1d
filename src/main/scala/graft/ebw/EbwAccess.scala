package graft.ebw

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridge for graft.pipeline: re-apply a fitted solve's primal map
 * `w0 * r(x . theta)` to any DataFrame with compatible columns. */
private[graft] object EbwAccess {
  def applyWeights(
      res: EbwResult, df: DataFrame, featuresCol: String,
      weightCol: String, outputCol: String): DataFrame =
    df.withColumn(outputCol,
      col(weightCol) * EntropyBalance.ratioColumn(df, featuresCol, res.theta, res.link))
}
