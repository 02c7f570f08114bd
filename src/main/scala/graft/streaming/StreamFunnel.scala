package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the ingestion-time mirror of
  * [[graft.analytics.Funnels.funnelUsers]], on the same
  * watermark-ordered replay contract as [[StreamTransitions]]: the
  * earliest-chain recurrence is order-sensitive, so each user buffers
  * only the events still inside the watermark horizon; the sealed
  * prefix below the watermark is sorted by (ts, event id) and folded
  * into the carried O(1) funnel state (stage cursor + last match µs),
  * emitting one row per stage ADVANCE exactly once.
  *
  * State per user: pending events in the horizon + the stage cursor —
  * never the history. Once the watermark passes all input, the emitted
  * rows reproduce the batch operator: max stage_idx per user equals
  * `funnelUsers.reached`, the stage-1 row's at_us equals `first_us`,
  * and the final stage row's at_us equals `last_us` (asserted by the
  * spec on an out-of-order multi-batch stream).
  *
  * Output rows: (user_id, stage_idx 1-based, at_us). */
object StreamFunnel {

  case class StageReach(user_id: Long, stage_idx: Int, at_us: Long)
  case class FBuf(pending: List[StreamTransitions.Pending], cur: Int,
      lastUs: Long)

  private[streaming] def update(stages: Array[String])(key: Long,
      it: Iterator[StreamTransitions.StreamEv],
      state: GroupState[FBuf]): Iterator[StageReach] = {
    val prev = state.getOption.getOrElse(FBuf(Nil, 0, Long.MinValue))
    val pending = prev.pending ++ it.map(e =>
      StreamTransitions.Pending(
        e.ts.toInstant.getEpochSecond * 1000000L +
          e.ts.toInstant.getNano / 1000L,
        e.event_id, e.event_type))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, hold) = pending.partition(_.tsUs < wmUs)
    val sorted = ready.sortBy(p => (p.tsUs, p.eventId))
    var cur = prev.cur
    var last = prev.lastUs
    val out = List.newBuilder[StageReach]
    for (p <- sorted if cur < stages.length) {
      if (p.eventType == stages(cur) && (cur == 0 || p.tsUs > last)) {
        last = p.tsUs
        cur += 1
        out += StageReach(key, cur, p.tsUs)
      }
    }
    // a completed funnel needs no more evidence: drop the buffer so
    // state for finished users is just the cursor row
    state.update(FBuf(if (cur >= stages.length) Nil else hold, cur, last))
    if (hold.nonEmpty && cur < stages.length)
      state.setTimeoutTimestamp(hold.map(_.tsUs).min / 1000L + 1L)
    out.result().iterator
  }

  def funnel(events: DataFrame, stages: Seq[String],
      watermarkDelay: String, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): Dataset[StageReach] = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    import events.sparkSession.implicits._
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).cast("string").as("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[StreamTransitions.StreamEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(stages.toArray))
  }
}
