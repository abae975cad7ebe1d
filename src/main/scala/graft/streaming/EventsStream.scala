package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface over the events table. The transformations
 * are written once against a (possibly streaming) DataFrame — the same
 * code path serves batch backfill and live ingestion, which is the
 * Spark-native way to keep the two consistent.
 */
object EventsStream {

  /** Tumbling 5-minute counts per event type. With `watermark` set this is
   * an append-mode streaming aggregation; without it, plain batch. */
  def windowedTypeCounts(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val e = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    e.groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming dedup: keep the first-PROCESSED occurrence of each
   * `keyCols` combo within the watermark horizon
   * (dropDuplicatesWithinWatermark — state is bounded by the watermark,
   * the only safe shape for an unbounded stream). Note: with out-of-order
   * arrival the survivor is the first to ARRIVE, not the earliest event
   * time; earliest-event-time semantics need a windowed min-by instead. */
  def streamingDedup(
      events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Per-user session windows (gap-based): events closer than `gap` merge
   * into one session. Uses the built-in session_window — in streaming mode
   * (with `watermark`) sessions finalize in append mode once the watermark
   * passes the gap; in batch mode the same code computes historical
   * sessionization. */
  def userSessions(
      events: DataFrame, gap: String, watermark: Option[String] = None): DataFrame = {
    val e = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    e.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("session_value"))
  }

  /** Stream-stream interval join: each click joined to the same user's
   * views within `[clickTs - horizon, clickTs]`. Both sides carry
   * watermarks, so the join state is bounded — the streaming analogue of
   * the AsOf/attribution pattern (an unbounded-history as-of join cannot
   * run on two unbounded streams; the horizon IS the state bound). */
  def clickViewJoin(
      clicks: DataFrame, views: DataFrame,
      watermark: String, horizon: String): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermark)
    val v = views.withWatermark("view_ts", watermark)
    c.join(v, expr(
      s"""click_user = view_user AND
         |view_ts <= click_ts AND
         |view_ts >= click_ts - INTERVAL $horizon""".stripMargin))
  }

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Per-user running totals via mapGroupsWithState — the custom-state
   * primitive (reference-free; required streaming capability). Emits the
   * updated running aggregate for every user seen in the micro-batch. */
  def runningUserTotals(
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](timeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
