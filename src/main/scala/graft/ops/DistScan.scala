package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix scans — the shared skeleton behind every "running
 * total in a global order" operator (ROC AUC's negatives-below walk,
 * BH-FDR ranks and suffix minima, KS/Mann-Whitney/Spearman rank walks,
 * RFM ntiles, token-budget selection).
 *
 * The naive form is ONE partition-less window — a single-task sort whose
 * cost scales with the frame. That was tolerated where the frame was
 * "distinct values of a metric", but distinct values of a CONTINUOUS
 * metric are the data itself: the same latent hot-partition family as a
 * window keyed on a quantized score (the round-14 selectByBudget
 * finding, generalized). This is the classic fix: range-partition on the
 * scan order (partition index stays monotone in the sort key), cumulate
 * per bucket, prefix-merge ONE carry row per bucket (a frame bounded by
 * the partition count, never the data) and broadcast the offsets back.
 * Bucket boundaries only decide WHICH bucket a row cumulates in —
 * offset + within reconstructs the same global prefix for any split, so
 * the range sampler never touches the result. Long/count sums and mins
 * are order-insensitive, so results are BIT-identical to the naive
 * window (the oracles prove it per operator).
 */
private[graft] object DistScan {

  private val Internal = Seq("_p", "_pt", "_off", "_run")

  private def parted(df: DataFrame, order: Seq[Column]): DataFrame = {
    val clash = Internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with DistScan " +
        "internals; rename them first")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    // CACHED (session-tracked), and load-bearing for CORRECTNESS, not
    // just cost: `_p` is spark_partition_id() over a sampled range
    // shuffle, so it is NONDETERMINISTIC across evaluations — the run
    // branch and the offsets branch would otherwise each re-evaluate
    // the shuffle and could see DIFFERENT bucket assignments (observed:
    // Mann-Whitney U varying run to run before this cache). The block
    // manager's read-through lock materializes each partition exactly
    // once, so every consumer reads the SAME bucketing. (Lost cached
    // blocks recompute — the Graph.localCheckpoint caveat class;
    // single-action consumers re-materialize consistently.)
    CacheScope.track(df.repartitionByRange(nPart, order: _*)
      .withColumn("_p", spark_partition_id()))
  }

  /** One carry row per bucket: `_off` = the combine of `perBucket` over
   * all EARLIER buckets (null when none). The global window here holds
   * at most numShufflePartitions rows — bounded by config, not data. */
  private def offsets(p: DataFrame, perBucket: Seq[Column],
      combine: Seq[Column => Column]): DataFrame = {
    val wOff = Window.orderBy(col("_p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = p.groupBy(col("_p"))
      .agg(perBucket.head.as("_pt0"),
        perBucket.tail.zipWithIndex.map { case (c, i) =>
          c.as(s"_pt${i + 1}")
        }: _*)
    combine.zipWithIndex.foldLeft(totals) { case (acc, (f, i)) =>
      acc.withColumn(s"_off$i", f(col(s"_pt$i")).over(wOff))
    }.select(col("_p") +: combine.indices.map(i => col(s"_off$i")): _*)
  }

  /** Adds, for each `(value, out)` pair, `out` = SUM of `value` over the
   * prefix of the global `order` (inclusive of the current row or not).
   * Null values add nothing (zero-coalesced inside the scan); the sum
   * type follows Spark's `sum` for the value's type. */
  def prefixSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], inclusive: Boolean): DataFrame = {
    require(values.nonEmpty, "prefixSums needs at least one value column")
    val p = parted(df, order)
    val upper = if (inclusive) 0L else -1L
    val wIn = Window.partitionBy(col("_p")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, upper)
    val zeroed = values.map { case (v, _) => coalesce(v, lit(0)) }
    val off = offsets(p, zeroed.map(v => sum(v)),
      values.map(_ => (c: Column) => sum(c)))
    val withRuns = values.zipWithIndex.foldLeft(p) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, coalesce(sum(zeroed(i)).over(wIn), lit(0)))
    }
    values.zipWithIndex.foldLeft(
      withRuns.join(broadcast(off), Seq("_p"))) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(out) + coalesce(col(s"_off$i"), lit(0)))
    }.drop("_p" +: values.indices.map(i => s"_off$i"): _*)
  }

  /** Adds `out` = the 1-based position of each row in the global `order`
   * (`row_number` semantics; the order must be total — include a
   * tie-breaking key). */
  def prefixRank(df: DataFrame, order: Seq[Column],
      out: String): DataFrame =
    prefixSums(df, order, Seq((lit(1L), out)), inclusive = true)

  private def prefixExtreme(df: DataFrame, order: Seq[Column],
      value: Column, out: String, inclusive: Boolean,
      isMin: Boolean): DataFrame = {
    val p = parted(df, order)
    val agg: Column => Column = if (isMin) min else max
    val merge: (Column, Column) => Column =
      if (isMin) least(_, _) else greatest(_, _)
    val upper = if (inclusive) 0L else -1L
    val wIn = Window.partitionBy(col("_p")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, upper)
    val off = offsets(p, Seq(agg(value)), Seq((c: Column) => agg(c)))
    p.withColumn(out, agg(value).over(wIn))
      .join(broadcast(off), Seq("_p"))
      .withColumn(out, merge(col(out), col("_off0")))
      .drop("_p", "_off0")
  }

  /** Adds `out` = MIN of `value` over the prefix of the global `order`
   * (run a DESC order for a suffix minimum). Nulls are skipped (`least`
   * semantics); rows before any non-null value get null. */
  def prefixMin(df: DataFrame, order: Seq[Column], value: Column,
      out: String, inclusive: Boolean = true): DataFrame =
    prefixExtreme(df, order, value, out, inclusive, isMin = true)

  /** [[prefixMin]]'s MAX twin (`greatest` merge, same null rules). */
  def prefixMax(df: DataFrame, order: Seq[Column], value: Column,
      out: String, inclusive: Boolean = true): DataFrame =
    prefixExtreme(df, order, value, out, inclusive, isMin = false)
}
