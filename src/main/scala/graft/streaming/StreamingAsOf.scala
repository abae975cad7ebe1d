package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming backward as-of join — the tolerance-bounded case, which is the
 * ONLY case a stream can run (SURVEY §2d): a left event may match rights
 * up to `toleranceMs` older, so per-key state is bounded by
 * tolerance + watermark delay. The unbounded-history as-of stays a batch
 * operator (its state would be the whole right stream).
 *
 * Input is ONE unioned stream of tagged events (`is_left`) because
 * multi-stream arbitrary stateful ops don't exist; union-then-group is the
 * standard shape (same trick as the batch union-window plan, AsOf.scala).
 *
 * Emission discipline: a left row finalizes when the WATERMARK passes its
 * event time — at that point every right with rt <= lt has either arrived
 * or been dropped as late, so the match is exactly the batch answer
 * `latest right in [lt - tolerance, lt]` (ties to the larger right id,
 * like AsOf.joinBackward). Unmatched lefts emit nothing, like the batch
 * operator. State: rights evict once `rt + tolerance < watermark` (no
 * future left can reach them), lefts once emitted.
 */
object StreamingAsOf {

  case class AsOfIn(key: Long, ts: Timestamp, is_left: Boolean, id: Long, value: Double)
  case class AsOfMatch(key: Long, left_id: Long, left_ts: Timestamp,
      right_id: Long, right_ts: Timestamp, right_value: Double)
  case class AsOfState(
      rights: Vector[(Long, Long, Double)], // (epochMs, id, value)
      lefts: Vector[(Long, Long)])          // (epochMs, id)

  def joinBackward(
      events: Dataset[AsOfIn], watermark: String,
      toleranceMs: Long): Dataset[AsOfMatch] = {
    require(toleranceMs >= 0, "tolerance must be non-negative")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfIn], state: GroupState[AsOfState]) =>
          val s = state.getOption.getOrElse(AsOfState(Vector.empty, Vector.empty))
          val wm = state.getCurrentWatermarkMs()
          val incoming = it.toVector
          val rights = s.rights ++ incoming.filterNot(_.is_left)
            .map(e => (e.ts.getTime, e.id, e.value))
          val lefts = s.lefts ++ incoming.filter(_.is_left)
            .map(e => (e.ts.getTime, e.id))
          // STRICTLY below the watermark: Spark drops late rows with
          // ts < wm but still accepts ts == wm, so a right at exactly the
          // watermark can arrive in a later batch — a left at lt == wm
          // must keep waiting or it could finalize against stale state
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.sortBy(l => (l._1, l._2)).flatMap { case (lt, lid) =>
            val cands = rights.filter(r => r._1 <= lt && lt - r._1 <= toleranceMs)
            if (cands.isEmpty) None
            else {
              val best = cands.maxBy(r => (r._1, r._2))
              Some(AsOfMatch(key, lid, new Timestamp(lt),
                best._2, new Timestamp(best._1), best._3))
            }
          }
          // rights older than (watermark - tolerance) can never match a
          // future left: future lefts finalize at ts > wm
          val keptRights = rights.filter(r => r._1 + toleranceMs >= wm)
          if (keptRights.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsOfState(keptRights, pending))
            // wake at whichever comes first: the earliest pending left
            // becoming finalizable, or the rights-eviction horizon (so
            // unmatchable rights don't linger while a far-future left
            // pends); timeout must sit strictly above the watermark
            val evictionWake = wm + math.max(1L, toleranceMs)
            val wake = pending.map(_._1).minOption match {
              case Some(lt) => math.min(lt, evictionWake)
              case None => evictionWake
            }
            state.setTimeoutTimestamp(math.max(wake, wm + 1L))
          }
          out.iterator
      }
  }
}
