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
