package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval (range) joins — "which points fall inside which intervals" and
 * "which intervals overlap" — as plain EQUI-joins Catalyst can shuffle.
 *
 * Spark has no native range-join operator: a raw `p BETWEEN s AND e` or
 * `ls <= re AND rs <= le` predicate has no equality conjunct, so Catalyst
 * can only plan BroadcastNestedLoopJoin (O(n·m) compute, one whole side
 * broadcast) — the same failure mode the as-of join (AsOf.scala) and the
 * fuzzy join (Linkage.scala) engineer around. The standard fix (used by
 * every range-join implementation from Spark's own streaming interval
 * join to DuckDB's IEJoin alternative) is BUCKETING: quantize the value
 * axis into fixed-width buckets, explode each interval to the buckets it
 * covers, and equi-join on the bucket id. The exact predicate then runs
 * only on per-bucket candidates, and the join shuffles hash-partitioned
 * like any other.
 *
 * De-duplication is by CONSTRUCTION, not a distinct shuffle: a point
 * lives in exactly one bucket (pointInInterval), and an overlapping pair
 * is counted only in the bucket containing the overlap's start
 * (overlapJoin) — every qualifying pair emerges exactly once.
 *
 * Scale shape: blowup per interval row is ceil(span / bucketWidth) + 1,
 * so `bucketWidth` should sit near the TYPICAL interval span (wider =
 * fewer replicas but bigger buckets; narrower = the reverse). Hot
 * moments — many intervals covering the same instant — are genuine data
 * skew; AQE's skew-join split handles the bucket-key shuffle, and the
 * per-bucket candidate check is a narrow codegen'd predicate.
 *
 * Columns must be pre-projected to disjoint names; bounds are inclusive
 * on both ends ([start, end], the SQL BETWEEN convention). Axis values
 * must stay within ±2^53 (double-exact range, year 2255 in epoch
 * MICROS) because bucket ids come from a floored double division —
 * epoch-NANOS axes must be pre-divided to micros (see q_events_window's
 * `div 1000` note in SparkEntry).
 */
object Interval {

  private def bucketOf(c: org.apache.spark.sql.Column, w: Long) =
    floor(c / lit(w)).cast("long")

  /**
   * Each row of `points` paired with every row of `intervals` whose
   * [startCol, endCol] contains pointCol (all integral — epoch micros,
   * byte offsets, any totally ordered long axis). Output: interval
   * columns ++ point columns, one row per qualifying (interval, point)
   * pair, exactly once each.
   */
  def pointInInterval(
      intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, pointCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint, both sides have: ${overlap.mkString(", ")}")
    val iv = intervals.withColumn("_ib",
      explode(sequence(bucketOf(col(startCol), bucketWidth),
        bucketOf(col(endCol), bucketWidth))))
    val pt = points.withColumn("_pb", bucketOf(col(pointCol), bucketWidth))
    iv.join(pt, col("_ib") === col("_pb")
        && col(pointCol).between(col(startCol), col(endCol)))
      .drop("_ib", "_pb")
  }

  /**
   * Every (left, right) interval pair that overlaps: ls <= re AND rs <= le
   * (closed bounds). Output: left columns ++ right columns ++ `overlap`
   * (the length of the shared segment, >= 0 — 0 means the intervals touch
   * at a single shared point). Each pair appears exactly once: the join
   * keeps it only in the bucket containing max(ls, rs), the overlap's
   * start, which both sides necessarily cover.
   */
  /**
   * Time-series resample + gap fill: bucket events to fixed windows per
   * key, materialize EVERY bucket in each key's [min, max] span (the
   * calendar grid real downsampling needs — a missing bucket is data,
   * not absence of a row), and forward-fill values across the gaps
   * (`last IGNORE NULLS`, the standard tick→bar construction). Gap rows
   * carry n = 0, avg_value NULL, filled_value = the latest preceding
   * observation (NULL only before a key's first observation).
   *
   * Timestamps are epoch-MICROS longs (the engine-portable arithmetic
   * the as-of and interval joins already use); `widthMicros` is the
   * bucket width. Averages round to 4dp so the DuckDB oracle replays
   * them exactly.
   *
   * Scale shape: one (key, bucket) aggregation, a per-key span
   * aggregation whose grid explode is bounded by span/width rows per
   * key, one keyed left join, one per-key window for the fill — every
   * shuffle is keyed, nothing global. A key observed over a huge span at
   * tiny width inflates ITS grid only (the documented envelope: pick
   * width near the reporting granularity, as with bucketWidth above).
   */
  def resampleFill(df: DataFrame, keyCol: String, tsMicrosCol: String,
      valueCol: String, widthMicros: Long): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be > 0, got $widthMicros")
    import org.apache.spark.sql.expressions.Window
    val actual = df
      .select(col(keyCol),
        expr(s"$tsMicrosCol div $widthMicros").as("bucket"), col(valueCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col(valueCol)), 4).as("avg_value"))
    val grid = actual.groupBy(col(keyCol))
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(actual, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("avg_value"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  def overlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint, both sides have: ${overlap.mkString(", ")}")
    val lb = left.withColumn("_lb",
      explode(sequence(bucketOf(col(lStart), bucketWidth),
        bucketOf(col(lEnd), bucketWidth))))
    val rb = right.withColumn("_rb",
      explode(sequence(bucketOf(col(rStart), bucketWidth),
        bucketOf(col(rEnd), bucketWidth))))
    lb.join(rb, col("_lb") === col("_rb")
        && col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
        && col("_lb") === bucketOf(greatest(col(lStart), col(rStart)), bucketWidth))
      .withColumn("overlap",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
      .drop("_lb", "_rb")
  }

  /**
   * Interval coalescing (the gaps-and-islands staple): merge each key's
   * overlapping-or-touching [start, end] intervals into maximal disjoint
   * "islands". Two intervals belong to one island when the later one
   * starts within `gap` of the running maximum end seen so far (gap = 0
   * merges only overlap/touch; a positive gap additionally bridges holes
   * up to that length — the session/maintenance-window semantics).
   * Output: key, island_start, island_end, n_merged, one row per island.
   *
   * This is the distributed form of the sweep: per key, order by
   * (start, end), carry max(end) so far, flag rows that start a new
   * island, and prefix-sum the flags into island ids — grouping by
   * (key, island) then closes each island in one aggregation. Both
   * windows and the aggregation partition by the SAME key, so the whole
   * thing is ONE Exchange; islands build inside their key's partition
   * and key count drives parallelism. Equal-(start, end) ties need no
   * tiebreak: the running max and the flags are order-invariant there.
   *
   * The coverage-merge inside Dedup.maskRepeatedSpans is this same sweep
   * as a per-row array fold; this operator is the table-level form, for
   * interval FRAMES (validity windows, outage spans, span coverage)
   * rather than per-document position arrays.
   */
  /**
   * Time-weighted average per key — the TWAP/TWA construction for
   * irregular observations (a plain mean over ticks overweights busy
   * periods; weighting each observation by how long it REMAINED the
   * current value until the next tick is the standard fix for prices,
   * gauge metrics, feature staleness): each observation holds from its
   * timestamp to the next observation's; the LAST observation carries
   * no duration (its holding period is unobserved — censored, the
   * dwellTimes convention, never a fabricated horizon). Keys with one
   * observation have zero observed span and report NULL twa — no
   * evidence is not an average.
   *
   * One key-ordered lead window + one keyed aggregation; same shapes
   * as dwellTimes. Output: key, n_obs, span (time units), twa (4dp),
   * mean_unweighted (4dp) — publish both; their gap is the burstiness
   * signal.
   */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // (t, v) ordering: ties at one instant must split the zero-length
    // and the held duration DETERMINISTICALLY or engines disagree on
    // which value carries the interval
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t"), col("v"))
    df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
        col(valueCol).cast("double").as("v"))
      .withColumn("_dur", lead(col("t"), 1).over(w) - col("t"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        coalesce(sum(col("_dur")), lit(0L)).as("span"),
        round(when(sum(col("_dur")) > 0,
          sum(col("v") * col("_dur")) / sum(col("_dur"))), 4).as("twa"),
        round(avg(col("v")), 4).as("mean_unweighted"))
  }

  /**
   * Maximum concurrency per key — the peak-load question every
   * interval table eventually gets asked (max simultaneous sessions,
   * in-transit shipments, open connections): sweep the boundaries
   * (+1 at start, −1 at end) in time order and report each key's
   * highest running level and the EARLIEST instant it is reached.
   * Half-open [start, end) semantics: an interval ending exactly when
   * another starts never overlaps it — ends sort before starts at the
   * same instant (the −1 delta orders first), the convention that
   * keeps back-to-back sessions at level 1.
   *
   * Shape at scale: one explode to 2 boundary rows per interval, ONE
   * key-ordered running-sum window (a single Exchange on the key —
   * never a global sort), then a key-level max_by aggregation; peak
   * selection replays exactly because the (level desc, ts asc) argmax
   * is deterministic. Zero-length/inverted intervals are rejected rows
   * upstream concerns — here end <= start simply contributes its −1
   * at or before its +1 and never lifts the level.
   * Output: key, max_concurrent, peak_ts.
   */
  def maxConcurrent(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t"), col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df
      .select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .select(col("k"), explode(array(
        struct(col("s").as("t"), lit(1).as("d")),
        struct(col("e").as("t"), lit(-1).as("d")))).as("b"))
      .select(col("k"), col("b.t").as("t"), col("b.d").as("d"))
      .withColumn("_lvl", sum(col("d")).over(w))
      .groupBy(col("k").as(keyCol))
      .agg(max(col("_lvl")).as("max_concurrent"),
        max_by(col("t"), struct(col("_lvl"), negate(col("t"))))
          .as("peak_ts"))
  }

  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, gap: Long = 0L): DataFrame = {
    require(gap >= 0, "gap must be non-negative")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val carried = df
      .withColumn("_maxe",
        max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val flagged = carried.withColumn("_new",
      when(col("_maxe").isNull || col(startCol) > col("_maxe") + lit(gap), 1L)
        .otherwise(0L))
    flagged
      .withColumn("_island", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /**
   * Inter-arrival burstiness per key — the event-cadence health probe
   * next to [[maxConcurrent]]'s load view and [[timeWeightedAvg]]'s
   * value view: from consecutive-event gaps, the coefficient of
   * variation cv = σ/μ and the Goh–Barabási burstiness
   * B = (σ − μ)/(σ + μ) ∈ (−1, 1): −1 a metronome, 0 a Poisson
   * process, → 1 bursty (long silences broken by spikes — the
   * signature of a scraper hammering, a retry storm, or batched
   * uploads pretending to be a stream). Keys with < 2 gaps report
   * NULL cv/burstiness — no dispersion evidence, the family's NULL
   * convention. Ties on the timestamp order deterministically by
   * (ts, id) — the acf rule.
   *
   * One keyed lag window (single Exchange) + one aggregation; no
   * fold, no envelope. Output: key, n_gaps, mean_gap (4dp),
   * sd_gap (4dp), cv (4dp), burstiness (4dp).
   */
  def interArrivalStats(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_id"))
    val gaps = df
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(idCol).as("_id"))
      .withColumn("_gap", (col("_t") - lag(col("_t"), 1).over(w))
        .cast("double"))
      .filter(col("_gap").isNotNull)
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("_gap")).as("_mu"),
        stddev_samp(col("_gap")).as("_sd"))
      .select(col(keyCol), col("n_gaps"),
        round(col("_mu"), 4).as("mean_gap"),
        (round(col("_sd"), 4) + lit(0.0)).as("sd_gap"),
        round(when(col("_mu") > 0, col("_sd") / col("_mu")), 4).as("cv"),
        round(when(col("_sd") + col("_mu") > 0,
          (col("_sd") - col("_mu")) / (col("_sd") + col("_mu"))), 4)
          .as("burstiness"))
  }
}
