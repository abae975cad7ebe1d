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

  /**
   * Per-group cardinality profile: EXACT distinct count plus basic value
   * stats. Exact distinct is a two-level hash aggregate (Spark expands to
   * a partial-distinct pre-aggregation, so the shuffle carries (group,
   * value) partials, not raw rows) — correct at any scale but the shuffle
   * width grows with the true cardinality; for web-scale cardinalities
   * use `groupDistinctApprox`.
   */
  def groupDistinct(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_distinct"),
        count(col(valueCol)).as("n_values"),
        count(lit(1)).as("n_rows"))

  /** Approximate per-group distinct count via HyperLogLog++
   * (`approx_count_distinct`) — the 100 TB path: the aggregation state is
   * one fixed-size HLL register set per group regardless of cardinality,
   * the shuffle carries merged sketches, and relative error is bounded by
   * `rsd` (default 5%). Mergeable sketch state also makes this the
   * STREAMING cardinality profile (Complete mode), like
   * `groupQuantilesApprox`. */
  def groupDistinctApprox(
      df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame = {
    require(rsd > 0.0 && rsd < 1.0, s"rsd must be in (0,1), got $rsd")
    df.groupBy(col(groupCol).as("grp"))
      .agg(approx_count_distinct(col(valueCol), rsd).as("n_distinct_approx"),
        count(col(valueCol)).as("n_values"),
        count(lit(1)).as("n_rows"))
  }

  /**
   * Per-source corpus health report — the CCNet-style "which crawl sources
   * are garbage" table a curation pipeline consults before choosing
   * filters. One row per source: doc count, approximate distinct-language
   * count (HLL++), mean/median quality, and token-count deciles.
   *
   * Exactly one narrow projection (the quality metrics) followed by ONE
   * groupBy-source aggregation whose per-group state is fixed-size (HLL
   * registers + KLL sketches + scalar sums) — no source's rows are ever
   * buffered, so the report costs one shuffle of sketch partials at any
   * corpus size.
   */
  def sourceReport(
      docs: DataFrame, sourceCol: String, langCol: String,
      textCol: String, idCol: String): DataFrame = {
    val q = TextMetrics.quality(docs, textCol, idCol,
      keep = Seq(sourceCol, langCol))
    q.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col(langCol)).as("n_langs_approx"),
        round(avg(col("quality")), 4).as("avg_quality"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"),
        percentile_approx(col("n_tokens"),
          array(lit(0.1), lit(0.5), lit(0.9)), lit(10000)).as("tok_q"),
        round(percentile_approx(col("quality"), lit(0.5), lit(10000))
          .cast("double"), 4).as("quality_p50"))
      .select(col("source"), col("n_docs"), col("n_langs_approx"),
        col("avg_quality"), col("avg_tokens"),
        col("tok_q")(0).cast("long").as("tokens_p10"),
        col("tok_q")(1).cast("long").as("tokens_p50"),
        col("tok_q")(2).cast("long").as("tokens_p90"),
        col("quality_p50"))
  }

  /**
   * Corpus-level heavy hitters — the EXACT top-k most frequent values of a
   * column (vocabulary terms, domains, user ids, …), with deterministic
   * rank ties broken by the value itself. One map-side-combined groupBy
   * then a `TakeOrdered` top-k on (count desc, value): the full frequency
   * table is never sorted or collected, so the cost beyond the groupBy is
   * a k-row per-partition heap — the same zero-global-sort shape as the
   * brute-force ANN top-k.
   */
  def topValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("value"))
      .limit(k)
  }

  /**
   * Sketch path for heavy hitters: a Count-Min Sketch over the column,
   * returning the CMS frequency ESTIMATE for each requested candidate
   * value. The sketch is a fixed-size (depth x width) counter grid built
   * in one distributed pass (`DataFrameStatFunctions.countMinSketch`,
   * mergeable per-partition state) — at 100 TB the sketch, not an exact
   * frequency table, is what fits beside the scan; estimates are
   * one-sided: estimate >= true count, and <= true + eps*N with
   * probability 1-delta (spec-asserted against exact counts).
   */
  def cmsEstimates(
      df: DataFrame, valueCol: String, candidates: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Seq[(String, Long)] = {
    val cms = df.stat.countMinSketch(col(valueCol).cast("string"),
      eps, confidence, seed)
    candidates.map(v => (v, cms.estimateCount(v)))
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
