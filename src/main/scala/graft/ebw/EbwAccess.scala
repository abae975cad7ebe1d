package graft.ebw

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridge for graft.pipeline: re-apply a fitted solve's primal map
 * `w0 * r(x . theta)` to any DataFrame with compatible columns. A failed
 * solve keeps the original weights (ratio 1), matching res.weighted —
 * transform must never silently emit the unconverged attempt. */
private[graft] object EbwAccess {
  def applyWeights(
      res: EbwResult, df: DataFrame, featuresCol: String,
      weightCol: String, outputCol: String): DataFrame =
    if (!res.converged) df.withColumn(outputCol, col(weightCol) * lit(1.0))
    else df.withColumn(outputCol,
      col(weightCol) * EntropyBalance.ratioColumn(df, featuresCol, res.theta, res.link))
}
