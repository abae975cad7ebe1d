package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * User-behavior analytics: ordered-step funnel conversion and cohort
 * retention — the two staple session/lifecycle reports every event
 * warehouse runs, expressed as keyed aggregations Catalyst can shuffle
 * like any other (no iterative per-step passes over the table).
 *
 * Both take epoch-MICROS long timestamps (the engine-portable arithmetic
 * shared with AsOf/Interval) and produce exact, engine-independent
 * numbers: counts are longs, rates round to 4dp.
 */
object Behavior {

  private def esc(s: String) = s.replace("'", "''")

  /**
   * Per-user funnel step times under greedy earliest-entry matching (the
   * semantics every funnel tool ships): the user's first `steps(0)` event
   * opens the funnel; step j completes at the first `steps(j)` event
   * STRICTLY after step j-1 and within `windowMicros` of the funnel
   * entry. Output: one row per user who entered, `step_ts[j]` = step j's
   * completion time or NULL.
   *
   * Shape: filter to step types (pushed to the scan), ONE user-keyed
   * shuffle collecting each user's step events sorted by time, then a
   * per-row linear `aggregate` fold over that array — k never multiplies
   * passes over the table, unlike the textbook k-chained-min-join plan
   * which shuffles k times. The fold is a native Catalyst higher-order
   * function: no UDF, no driver state. Envelope: a user's STEP-TYPE
   * events must fit one array (funnel steps are a filtered slice of
   * activity; a bot with millions of step events inflates its own row
   * only).
   *
   * Greedy-earliest equivalence to the sequential-min form (which the
   * DuckDB oracle replays independently): step j's fold completion is
   * exactly min(ts | type=steps(j), ts > t_{j-1}, ts <= t_0 + W), since
   * the sorted scan meets candidates in time order and never revisits.
   */
  def funnelTimes(df: DataFrame, userCol: String, tsMicrosCol: String,
      typeCol: String, steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val k = steps.size
    val evs = df.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("u"), col(tsMicrosCol).cast("long").as("ts"),
        col(typeCol).as("et"))
      .groupBy("u")
      .agg(sort_array(collect_list(struct(col("ts"), col("et")))).as("evs"))
    val init = s"array(${Seq.fill(k)("CAST(NULL AS BIGINT)").mkString(", ")})"
    def accWith(j: Int) = (0 until k).map {
      case i if i < j  => s"acc[$i]"
      case i if i == j => "e.ts"
      case _           => "CAST(NULL AS BIGINT)"
    }.mkString("array(", ", ", ")")
    val whens = (
      s"WHEN acc[${k - 1}] IS NOT NULL THEN acc" +:
      s"WHEN acc[0] IS NULL THEN IF(e.et = '${esc(steps(0))}', ${accWith(0)}, acc)" +:
      (1 until k).map(j =>
        s"WHEN acc[$j] IS NULL THEN IF(e.et = '${esc(steps(j))}' " +
        s"AND e.ts > acc[${j - 1}] AND e.ts <= acc[0] + ${windowMicros}L, " +
        s"${accWith(j)}, acc)")
    ).mkString(" ")
    evs.select(col("u").as(userCol),
        expr(s"aggregate(evs, $init, (acc, e) -> CASE $whens ELSE acc END)")
          .as("step_ts"))
      .filter(col("step_ts")(0).isNotNull)
  }

  /**
   * Funnel summary: one row per step with the users reaching it and the
   * conversion rate from funnel entry (4dp). Built on [[funnelTimes]];
   * the reduction past the per-user frame is one k-column count
   * aggregate (a 1-row reduction, like the EBW moment pass) exploded to
   * step rows.
   */
  def funnel(df: DataFrame, userCol: String, tsMicrosCol: String,
      typeCol: String, steps: Seq[String], windowMicros: Long): DataFrame = {
    val k = steps.size
    val times = funnelTimes(df, userCol, tsMicrosCol, typeCol, steps, windowMicros)
    val counts = times.agg(
      count(col("step_ts")(0)).as("n0"),
      (1 until k).map(j => count(col("step_ts")(j)).as(s"n$j")): _*)
    counts.select(explode(array((0 until k).map(j =>
        struct(lit(j + 1).as("step"), lit(steps(j)).as("event_type"),
          col(s"n$j").as("n_users"),
          round(col(s"n$j") / col("n0"), 4).as("conv_rate"))): _*)).as("r"))
      .select("r.*")
  }

  /**
   * Cohort retention: users cohorted by the fixed-width period of their
   * first event; for each (cohort, period offset) the count of cohort
   * members active in that period and the retention rate vs cohort size
   * (4dp). The activity grid is NOT gap-filled — an absent (cohort,
   * offset) row means zero members were active ([[Interval.resampleFill]]
   * is the gap-materializing primitive when a dense grid is wanted).
   *
   * Shape: distinct (user, period) → first-period per user → one keyed
   * join + two keyed aggregations; cohort sizes join back on the cohort
   * key. Every shuffle is keyed on user or cohort, nothing global.
   */
  def cohortRetention(df: DataFrame, userCol: String, tsMicrosCol: String,
      widthMicros: Long): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be > 0, got $widthMicros")
    val e = df.select(col(userCol).as("u"),
      expr(s"$tsMicrosCol div $widthMicros").as("wk")).distinct()
    val first = e.groupBy("u").agg(min("wk").as("cohort"))
    val act = e.join(first, "u")
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    act.join(sizes, "cohort")
      .select(col("cohort"), col("offset"), col("n_active"),
        round(col("n_active") / col("n_cohort"), 4).as("retention"))
  }

  /**
   * Top user journeys — the k most common opening event paths: each
   * key's first `maxSteps` event types in (ts, type) order joined with
   * '>' (the "view>click>purchase" strings every product-analytics tool
   * leads with), counted across keys. Output: path, n_users, share
   * (4dp), rank — top-k by (n desc, path).
   *
   * One key-partitioned shuffle collecting each key's step-prefix
   * (sort_array slice — per-key state is maxSteps structs, NOT the
   * key's full history… the collect is the full event list pre-slice,
   * so the per-key-series envelope of funnel/cusum applies; pre-filter
   * event types or time ranges upstream for keys with pathological
   * volumes), one path aggregation (map-side combined), top-k by
   * TakeOrdered — never a global sort.
   */
  /**
   * Adoption / cumulative-uniques curve per group — the growth report
   * behind every "users over time" chart, computed WITHOUT a cumulative
   * distinct (which no engine can decompose): a user's FIRST day in the
   * group marks them new, daily new counts running-sum into the
   * cumulative uniques. Per (group, day): events, active distinct
   * users, new users, cumulative users. Two keyed aggregations (first
   * day per (group, user); daily rollup) + one per-group ordered
   * running sum — everything group/user-keyed, the running sum's
   * partition is the group key (never a single global window).
   * Days carry whatever unit `dayCol` already encodes.
   */
  def adoption(df: DataFrame, groupCol: String, userCol: String,
      dayCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(userCol),
      col(dayCol).cast("long").as("_day"))
    val firstDay = base.groupBy(col(groupCol), col(userCol))
      .agg(min(col("_day")).as("_first"))
    val newPerDay = firstDay.groupBy(col(groupCol), col("_first").as("_day"))
      .agg(count(lit(1)).as("n_new_users"))
    val daily = base.groupBy(col(groupCol), col("_day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_active_users"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily.join(newPerDay, Seq(groupCol, "_day"), "left")
      .withColumn("n_new_users", coalesce(col("n_new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new_users")).over(w))
      .withColumnRenamed("_day", "day")
  }

  /**
   * RFM segmentation (recency / frequency / monetary quintiles) — the
   * classic customer-value partition, reused verbatim for data sources
   * (recency of last crawl, document count, total bytes): per key, R =
   * most recent activity, F = activity count, M = value sum; each
   * scored 1–5 by `ntile(5)` with 5 = best (most recent / most
   * frequent / highest value), ties broken by the key so every engine
   * cuts identically. Output adds the composite `segment` string
   * ("555" = best-everything).
   *
   * Shape: one keyed aggregation to n_keys rows, then three
   * [[DistScan]] rank scans with the closed-form ANSI ntile cut applied
   * to the global rank — at 100M+ customers the older partition-less
   * ntile windows were three single-task sorts over every key (the same
   * latent hot-partition family as the distinct-value walks); the
   * closed form (first n%5 buckets take one extra row) reproduces
   * ntile(5) exactly, so any SQL engine still cuts identically.
   */
  def rfm(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // 4dp-rounded value total: both the output AND the m-quantile
    // ordering read the rounded number, so parallel-sum ulp wobble can
    // neither flip a cut nor desynchronize engines (the cusum rule)
    val agg = df.groupBy(col(keyCol))
      .agg(max(col(tsCol).cast("long")).as("last_ts"),
        count(lit(1)).as("n_orders"),
        round(sum(col(valueCol).cast("double")), 4).as("total_value"))
    val n = agg.agg(count(lit(1)).as("_n"))
    def score(order: Seq[Column], out: String)(d: DataFrame): DataFrame = {
      val bs = floor(col("_n") / 5)
      val rem = col("_n") - bs * 5
      val thr = rem * (bs + 1)
      DistScan.prefixRank(d, order, "_r")
        .withColumn(out,
          when(col("_r") <= thr, floor((col("_r") - 1) / (bs + 1)) + 1)
            .otherwise(rem + floor((col("_r") - thr - 1) / bs) + 1)
            .cast("long"))
        .drop("_r")
    }
    score(Seq(col("last_ts").asc, col(keyCol)), "r_score")(
      score(Seq(col("n_orders").asc, col(keyCol)), "f_score")(
        score(Seq(col("total_value").asc, col(keyCol)), "m_score")(
          agg.crossJoin(n))))
      .withColumn("segment", concat(col("r_score"), col("f_score"),
        col("m_score")))
      .select(col(keyCol), col("last_ts"), col("n_orders"),
        col("total_value"), col("r_score"), col("f_score"),
        col("m_score"), col("segment"))
  }

  def topPaths(df: DataFrame, keyCol: String, tsMicrosCol: String,
      typeCol: String, maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1, s"maxSteps must be >= 1, got $maxSteps")
    require(k >= 1, s"k must be >= 1, got $k")
    val paths = df
      .select(col(keyCol).as("u"), col(tsMicrosCol).cast("long").as("ts"),
        col(typeCol).cast("string").as("et"))
      .groupBy("u")
      .agg(sort_array(collect_list(struct(col("ts"), col("et"))))
        .as("evs"))
      .select(array_join(
        transform(slice(col("evs"), 1, maxSteps), e => e("et")), ">")
        .as("path"))
    val counts = paths.groupBy("path").agg(count(lit(1)).as("n_users"))
    val total = counts.agg(sum("n_users").cast("double").as("_tot"))
    counts.crossJoin(total)
      .select(col("path"), col("n_users"),
        round(col("n_users") / col("_tot"), 4).as("share"))
      .orderBy(desc("n_users"), col("path"))
      .limit(k)
      .withColumn("rank", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("n_users"), col("path"))).cast("long"))
  }

  /**
   * Last-touch conversion attribution — which channel gets credit for
   * each conversion (the funnel says users convert; attribution says
   * what they touched LAST before doing so): for every conversion
   * event, the most recent channel event of the same user at or before
   * the conversion instant, NULL when none lands inside `lookback`
   * (an unattributed conversion is a finding — organic or tracking
   * gap — never a dropped row). Equal-timestamp ties process channels
   * before conversions (a click logged at the purchase instant
   * attributes; deterministic via the (ts, kind, id) sort).
   *
   * ONE user-keyed window pass over the union of both event kinds —
   * `last(channel) IGNORE NULLS` over rows-before-current does the
   * backward search without an as-of join (same user, same frame; the
   * as-of kernel is for CROSS-frame alignment). Shape: one Exchange on
   * the user key, no fold, no action.
   * Output: conversion id, user, conv_ts, channel (nullable),
   * channel_ts (nullable), gap_us (nullable).
   */
  def lastTouchAttribution(df: DataFrame, userCol: String,
      tsMicrosCol: String, typeCol: String, idCol: String,
      conversionType: String, channelTypes: Seq[String],
      lookbackMicros: Long): DataFrame = {
    require(channelTypes.nonEmpty, "attribution needs channel types")
    require(!channelTypes.contains(conversionType),
      "the conversion type cannot also be a channel")
    require(lookbackMicros > 0, "lookback must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u"))
      .orderBy(col("ts"), col("kind"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = df
      .filter(col(typeCol) === conversionType ||
        col(typeCol).isin(channelTypes: _*))
      .select(col(userCol).as("u"), col(tsMicrosCol).cast("long").as("ts"),
        col(idCol).as("eid"),
        when(col(typeCol) === conversionType, 1).otherwise(0).as("kind"),
        when(col(typeCol) =!= conversionType, col(typeCol)).as("ch"))
    base
      .withColumn("_lc", last(col("ch"), ignoreNulls = true).over(w))
      .withColumn("_lt",
        last(when(col("ch").isNotNull, col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("kind") === 1)
      .select(col("eid").as(idCol), col("u").as(userCol),
        col("ts").as("conv_ts"),
        when(col("ts") - col("_lt") <= lookbackMicros, col("_lc"))
          .as("channel"),
        when(col("ts") - col("_lt") <= lookbackMicros, col("_lt"))
          .as("channel_ts"),
        when(col("ts") - col("_lt") <= lookbackMicros,
          col("ts") - col("_lt")).as("gap_us"))
  }

  /**
   * Dwell-time profile — how long users sit on each step before the
   * NEXT action (the engagement signal session counts miss: a funnel
   * can convert identically while users hesitate 10× longer on one
   * step): per user, the gap from each event to the user's next event
   * (any type — dwell ends when the user does anything else); the last
   * event of a user has no successor and drops out (an open-ended gap
   * is censored data, not a zero). Per event type: gap count, mean,
   * exact median and p90, and max, in seconds at 3dp.
   *
   * Shape at scale: one user-keyed lead window (a single Exchange — the
   * transitionMatrix shape), then one event-type aggregation with exact
   * percentiles (swap percentile → approx_percentile at sketch
   * precision for beyond-memory type cardinalities, the winsorize
   * contract). No fold, no action.
   * Output: event_type, n_gaps, avg_s, p50_s, p90_s, max_s.
   */
  def dwellTimes(df: DataFrame, userCol: String, tsMicrosCol: String,
      typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts"), col("et"))
    df
      .select(col(userCol).as("u"), col(tsMicrosCol).cast("long").as("ts"),
        col(typeCol).cast("string").as("et"))
      .withColumn("_next", lead(col("ts"), 1).over(w))
      .filter(col("_next").isNotNull)
      .withColumn("_gap", (col("_next") - col("ts")) / lit(1e6))
      .groupBy(col("et").as("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg("_gap"), 3).as("avg_s"),
        round(percentile(col("_gap"), lit(0.5)), 3).as("p50_s"),
        round(percentile(col("_gap"), lit(0.9)), 3).as("p90_s"),
        round(max("_gap"), 3).as("max_s"))
  }
}
