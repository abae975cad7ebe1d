package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
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
 * finding, generalized). This is the classic fix: bucket rows by a
 * DETERMINISTIC range function of the leading sort key (bucket index
 * monotone in the sort order), cumulate per bucket, prefix-merge ONE
 * carry row per bucket (a frame bounded by the bucket count, never the
 * data) and broadcast the offsets back. Bucket boundaries only decide
 * WHICH bucket a row cumulates in — offset + within reconstructs the
 * same global prefix for any split, so boundary quality affects balance
 * only, never the result. Long/count sums and mins/maxes are
 * order-insensitive, so results are BIT-identical to the naive window
 * (the oracles prove it per operator); DOUBLE sums re-associate across
 * buckets, so callers feeding doubles get ulp-scale reassociation vs the
 * naive window — round before comparing (the repo's 4dp rule; see
 * selectByBudget).
 *
 * Determinism: bucket CUT POINTS are sampled once at operator-construction
 * time and folded into the plan as literals, and the per-bucket carry
 * offsets are a bounded (≤ nBuckets rows) aggregate subtree broadcast-
 * joined back inside the result plan — so `_p` is a pure function of the
 * row and every evaluation of the result plan sees the same bucketing. (The previous
 * shape derived `_p` from spark_partition_id over a sampled range
 * shuffle — nondeterministic across plan branches — and leaned on a
 * session-tracked cache to pin one materialization; that cache was a
 * CORRECTNESS dependency a routine unpersistAll could break.)
 *
 * Cost shape: the input frame is pinned in the [[CacheScope.Ops]] scope
 * and evaluated ONCE — the cut-point sample job fills the cache, the
 * per-bucket totals aggregate and the returned result plan read it.
 * Unlike the pre-round-15 cache this pin is an OPTIMIZATION, not a
 * correctness dependency: `_p` is a literal function of the row, so an
 * evicted block, an early `unpersistAll`, or a lost executor recomputes
 * the IDENTICAL bucketing (measured without the pin: every scan paid
 * ~3 input evaluations — sample, totals, result — tripling the
 * family's floors; with it, r14's cost shape is restored at r15's
 * determinism). Lifecycle: pins live in their own [[CacheScope.Scan]]
 * scope. Terminal 1-row statistics (rocAuc, ksTest, mannWhitney,
 * spearman) SELF-RELEASE via [[sealTerminal]] — the result is
 * materialized (bounded rows by construction) into a local frame and
 * exactly the pins created during THAT statistic's construction drop
 * (a thread-local recorder around the by-name result argument), so a
 * long session of drift dashboards never accumulates corpus-scale
 * spill or registry references — and a concurrent thread's in-flight
 * lazy scan (bhAdjust, RFM, Sampling) KEEPS its pin: a seal releases
 * only its own statistic's pins, never a sibling's (the r16 shape
 * dropped the whole scope, which was correct — pins are
 * optimization-only — but made depth-d lazy chains pay repeated
 * re-evaluations under interleaved use). Operators returning
 * data-scale lazy frames keep their pin until the caller releases —
 * via `Profile.unpersistAll` / `Sampling.unpersistAll` (or the
 * Dedup/Similarity ones, which drain Scan too).
 * Like fitIvfIndex, the construction jobs are an index build, not part
 * of the result plan; chained scans (BH-FDR, RFM, Spearman) pin per
 * level, so depth-d chains cost O(d) evaluations, not O(2^d).
 */
private[graft] object DistScan {

  /** Buckets per scan: a multiple of the shuffle parallelism so the hash
   * exchange on `_p` spreads buckets ~evenly across partitions. */
  private def nBuckets(df: DataFrame): Int =
    4 * df.sparkSession.sessionState.conf.numShufflePartitions

  /** Per-statistic pin recorder: [[sealTerminal]] installs a buffer for
   * the duration of its by-name result construction; every pin a prefix
   * op creates on THIS thread lands in it, so the seal can release
   * exactly its own statistic's pins and nothing else. Null (no seal in
   * flight) for lazy-scan callers — their pins stay until the owner's
   * unpersistAll. Thread-local by design: a concurrent thread's seal
   * never sees (or releases) this thread's pins. */
  private val localPins =
    new ThreadLocal[scala.collection.mutable.Buffer[DataFrame]]

  private def notePin(pinned: DataFrame): Unit = {
    val buf = localPins.get()
    if (buf != null) buf += pinned
  }

  private def guard(df: DataFrame): Unit = {
    // prefix-based: the generated internals are _p, _pt<i>, _off<i>
    val clash = df.columns.filter(c =>
      c == "_p" || c.startsWith("_pt") || c.startsWith("_off"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with DistScan " +
        "internals; rename them first")
  }

  /** Deterministic bucket id: cut points of the LEADING sort key are
   * sampled once (one TakeOrdered job over the projected key) and folded
   * in as literals; `_p` = how many cuts precede the row's key in the
   * sort direction — a pure, monotone-in-the-order function of the row.
   * Nulls follow Spark's sort defaults (first bucket when ascending,
   * last when descending). Any cut set is CORRECT (monotone by
   * construction); sampling only buys balance. */
  private def bucketCol(df: DataFrame, order: Seq[Column]): Column = {
    val (key, desc) = GraftSqlBridge.sortInfo(order.head)
    val n = nBuckets(df)
    val sampleSize = n * 16
    // one job: uniform sample via rand + TakeOrdered, then a trivial
    // sort of the <= sampleSize rows to read off equi-depth quantiles
    val svals = df.select(key.as("_k")).filter(col("_k").isNotNull)
      .withColumn("_r", rand(42)).orderBy(col("_r")).limit(sampleSize)
      .orderBy(col("_k").asc).select(col("_k"))
      .collect().map(_.get(0))
    if (svals.isEmpty) return lit(0) // empty/all-null key: one bucket
    val step = svals.length.toDouble / n
    val cuts = (1 until n)
      .map(i => svals(math.min(svals.length - 1, (i * step).toInt)))
      .distinct
    // r19: bucket id via a BALANCED BINARY-SEARCH when-tree instead of
    // the linear count fold — the fold evaluated one comparison per cut
    // per row (~128 at 32 shuffle partitions) where log2(cuts) suffices,
    // and the bucket id is evaluated on every totals/result read of the
    // pin. Identical bucket ids by construction: the tree performs the
    // SAME strict comparisons against the SAME ascending cut literals,
    // and counting trues of a predicate monotone along a sorted list IS
    // binary search. Null keys take every `otherwise` branch and land at
    // the ascending tree's leftmost leaf = 0 (Spark's nulls-first
    // ascending default, exactly the fold's otherwise(0) total); desc
    // keeps the explicit isNull -> last-bucket guard.
    val m = cuts.length
    if (desc) {
      // bucket = #{cuts c : key < c}; trues are a SUFFIX of the
      // ascending cuts, so bucket >= mid  <=>  key < cuts(m - mid)
      def tree(lo: Int, hi: Int): Column =
        if (lo == hi) lit(lo)
        else {
          val mid = (lo + hi + 1) / 2
          when(key < lit(cuts(m - mid)), tree(mid, hi))
            .otherwise(tree(lo, mid - 1))
        }
      when(key.isNull, lit(m)).otherwise(tree(0, m))
    } else {
      // bucket = #{cuts c : key > c}; trues are a PREFIX of the
      // ascending cuts, so bucket >= mid  <=>  key > cuts(mid - 1)
      def tree(lo: Int, hi: Int): Column =
        if (lo == hi) lit(lo)
        else {
          val mid = (lo + hi + 1) / 2
          when(key > lit(cuts(mid - 1)), tree(mid, hi))
            .otherwise(tree(lo, mid - 1))
        }
      tree(0, m)
    }
  }

  /** One carry row per bucket, as a LAZY bounded subtree: the per-bucket
   * combines are aggregated distributed (map-side combined, reading the
   * pin) down to ≤ nBuckets rows (bounded by config, never data), and
   * the prefix-combine window runs over that bounded frame INSIDE the
   * result plan — the caller broadcast-joins it back. `_off<i>` = the
   * combine of `perBucket(i)` over all EARLIER buckets (null when none).
   *
   * r19 (VERDICT #4): previously the totals were collect()ed and
   * re-created as a local frame — a separate driver job (plus a
   * 32-partition ParallelCollection scan of ~128 rows) per scan level.
   * The DistScan family's remaining cost profile is job-count latency,
   * not bytes (q_spearman: 28 stages, 3.9 s wall, 32 s task time —
   * pure scheduling), so a scan level now runs ONE driver job: the
   * cut-point sample (which also fills the pin); totals, carry window
   * and join-back all ride the result action. Values are identical —
   * the same distributed aggregate feeds the same window.
   *
   * KNOWN LOG LINE: the prefix window below is partition-less, so Spark
   * emits `WARN WindowExec: No Partition Defined ... serious performance
   * degradation` once per scan. The warning's premise does not apply —
   * the frame is the ≤ nBuckets carry table (4·shuffle-partitions rows
   * by config, never data). Operators chasing this warning in cluster
   * logs should match it against a DistScan-family query and move on; a
   * driver-side fold would silence it only by reimplementing typed
   * sum/min/max arithmetic for every value type the scans carry. */
  private def offsets(p: DataFrame, perBucket: Seq[Column],
      combine: Seq[Column => Column]): DataFrame = {
    val totals = p.groupBy(col("_p"))
      .agg(perBucket.head.as("_pt0"),
        perBucket.tail.zipWithIndex.map { case (c, i) =>
          c.as(s"_pt${i + 1}")
        }: _*)
    val wOff = Window.orderBy(col("_p"))
      .rowsBetween(Window.unboundedPreceding, -1)
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
    guard(df)
    // optimization-only pin (see the object doc): the sample job fills
    // it, totals + the result plan read it; recompute is identical.
    // FanOut before the pin: the _p bucket fold (a ~4·partitions-deep
    // when-chain per row) evaluates on every cached partition, and with
    // AQE-planned cache partitioning a small input coalesces to ONE
    // partition — serializing the fold across the totals and result
    // scans (r18 measured: q_spearman 4.3 -> 9.3 s). No-op at scale.
    val pinned = CacheScope.track(FanOut(df), CacheScope.Scan)
    notePin(pinned)
    val p = pinned.withColumn("_p", bucketCol(pinned, order))
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
    guard(df)
    // optimization-only (object doc); FanOut as in prefixSums
    val pinned = CacheScope.track(FanOut(df), CacheScope.Scan)
    notePin(pinned)
    val p = pinned.withColumn("_p", bucketCol(pinned, order))
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

  /** Terminal-statistic seal: CONSTRUCT `result` (by-name — every prefix
   * op the construction runs records its pin in a thread-local buffer),
   * materialize it (statistics-sized by construction — a 1-row test
   * readout, never data; `maxRows` fails fast if a caller mislabels a
   * data-scale frame as terminal), release exactly the pins THIS
   * statistic created, and hand back the rows as a local frame with the
   * identical schema. The returned frame holds no reference to the scan
   * plan, so the statistic's cost shape is one input evaluation total
   * (sample fills the pin, totals + this collect read it) and the
   * statistic leaves the session's cache registry exactly as it found
   * it — a sibling thread's in-flight lazy scan keeps its pin (the
   * self-release contract DriverStateAuditSpec pins). NOTE: all
   * pin-creating construction must happen INSIDE the argument
   * expression — a prefix op run before the call records nowhere and
   * its pin stays until unpersistAll. */
  def sealTerminal(result: => DataFrame, maxRows: Int = 1024): DataFrame = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    val prev = localPins.get()
    localPins.set(buf)
    val res =
      try result
      finally { if (prev == null) localPins.remove() else localPins.set(prev) }
    val spark = res.sparkSession
    val rows = res.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"sealTerminal materializes the result on the driver but got > " +
        s"$maxRows rows: only statistics-sized terminal readouts may " +
        "seal — return the lazy frame and release via unpersistAll " +
        "instead")
    buf.foreach(CacheScope.untrack)
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), res.schema)
  }
}
