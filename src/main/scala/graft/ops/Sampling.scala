package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data curation. Unlike
 * `DataFrame.sample`/`sampleBy` (Bernoulli draws: non-exact counts,
 * partitioning-dependent), these rank rows by a cryptographic hash of
 * (seed, id) — the sample is EXACT-size per stratum, reproducible across
 * runs/cluster layouts, stable under appends of other strata, and
 * replayable in any engine with md5 (the DuckDB oracle gates it).
 */
object Sampling {

  /**
   * Exact-size stratified sample: up to `n` rows per stratum, chosen as
   * the lowest md5(seed || '|' || id) within each stratum (ties broken by
   * id). Two window stages / two exchanges: a partial top-n per
   * (stratum, input partition) spreads hot strata across tasks, then the
   * global per-stratum rank sees at most n * numPartitions rows per
   * stratum — skew-proof AND provably identical to a single global
   * window.
   */
  def stratifiedExact(
      df: DataFrame, stratumCol: String, idCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "sample size must be positive")
    val internal = Seq("_hrank", "_part", "_lr", "_sample_rank")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with stratifiedExact internals; rename them first")
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    // two-stage exact top-n (the batchTopK pattern): a hot stratum would
    // otherwise funnel through ONE window task. Stage 1 takes the partial
    // top-n per (stratum, input partition) — any grouping is valid, the
    // union of partial top-ns contains the global top-n — so the global
    // stage ranks at most n * numPartitions rows per stratum.
    val wLocal = Window.partitionBy(col(stratumCol), col("_part"))
      .orderBy(col("_hrank"), col(idCol))
    val pruned = df
      .withColumn("_hrank", rank)
      .withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= n)
      .drop("_lr", "_part")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("_hrank"), col(idCol))
    pruned.withColumn("_sample_rank", row_number().over(w))
      .filter(col("_sample_rank") <= n)
      .drop("_sample_rank", "_hrank")
  }

  /** Deterministic fraction-based downsample: keep a row iff the md5 hash
   * of (seed, id) falls below the fraction threshold (hex-prefix
   * comparison — uniform over ids, independent of partitioning, exact in
   * expectation and reproducible). */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    // first 12 hex chars as an integer in [0, 16^12): compare against
    // fraction * 16^12 — plenty of resolution, no float-parse ambiguity
    val space = math.pow(16.0, 12).toLong
    val cut = (fraction * space).toLong
    val h = conv(substring(md5(concat(lit(s"$seed|"), col(idCol).cast("string"))), 1, 12),
      16, 10).cast("long")
    df.filter(h < cut)
  }
}
