package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus / table profiling operators — the "describe my 100 TB of data"
 * surface a curation pipeline needs before filtering decisions.
 */
object Profile {

  /**
   * Per-group EXACT quantiles (linear interpolation, the percentile/
   * quantile_cont definition shared by Spark and DuckDB) plus group
   * counts, one output row per (group, q). Exact percentile buffers each
   * group's values on the aggregator — fine into the millions of rows per
   * group; for web-scale groups use `groupQuantilesApprox`, which holds
   * only a fixed-size sketch per group.
   */
  def groupQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val qLits = array(qs.map(lit): _*)
    // DSL function, not an expr() string: valueCol stays an arbitrary
    // column NAME (never parsed as SQL), like every other operator
    df.groupBy(col(groupCol).as("grp"))
      .agg(percentile(col(valueCol), qLits).as("vs"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n"), posexplode(col("vs")).as(Seq("qi", "v")))
      .select(col("grp"),
        element_at(qLits, col("qi") + 1).as("q"),
        round(col("v"), 4).as("value"),
        col("n"))
  }

  /** Approximate per-group quantiles via approx_percentile (KLL-style
   * fixed-size sketch per group — the 100 TB path: no group's values are
   * ever buffered whole). Same output shape as `groupQuantiles`.
   *
   * Also the STREAMING profile: pass a streaming DataFrame and write the
   * result in Complete output mode — the sketch is a mergeable aggregation
   * buffer, so Structured Streaming keeps one fixed-size sketch per group
   * as state and re-emits refreshed quantiles every micro-batch (state is
   * bounded by #groups x sketch size, never by the stream length; rank
   * error <= n/accuracy). One code path serves batch and live profiling. */
  def groupQuantilesApprox(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val qLits = array(qs.map(lit): _*)
    df.groupBy(col(groupCol).as("grp"))
      .agg(percentile_approx(col(valueCol), qLits, lit(accuracy)).as("vs"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n"), posexplode(col("vs")).as(Seq("qi", "v")))
      .select(col("grp"),
        element_at(qLits, col("qi") + 1).as("q"),
        round(col("v").cast("double"), 4).as("value"),
        col("n"))
  }
}
