package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-flow transitions — the ingestion-time mirror of
  * [[graft.analytics.Funnels.transitions]], built on WATERMARK-ORDERED
  * REPLAY: adjacency ("A immediately followed by B") is an order-
  * sensitive property, so a stateful operator cannot process events in
  * arrival order when the stream is out of order. Each user's state
  * buffers events still inside the watermark horizon; once the
  * watermark passes an event's time, no earlier event can arrive
  * (Spark drops later-than-watermark stragglers), so the buffered
  * prefix below the watermark is FINAL — it is sorted by (ts, event id)
  * and replayed against the user's carried last-emitted event,
  * emitting one transition row per adjacent pair exactly once.
  *
  * An event-time timeout is armed at the earliest pending event's
  * timestamp, so a user with no further traffic still flushes when the
  * global watermark advances past their buffered events.
  *
  * State per user: the pending events inside the watermark horizon
  * (bounded by delay × per-user rate) plus one (type, ts, id) carry —
  * NOT the user's history. After the watermark passes every input
  * event, the emitted rows aggregate to exactly the batch
  * [[graft.analytics.Funnels.transitions]] counts (the spec drives an
  * out-of-order multi-batch stream and asserts equality).
  *
  * Output rows: (user_id, from_type, to_type, at_us) — at_us is the
  * later event's microsecond timestamp, so each transition is emitted
  * at most once and is join-stable. */
object StreamTransitions {

  case class StreamEv(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  case class Pending(tsUs: Long, eventId: Long, eventType: String)
  case class Buf(pending: List[Pending], hasLast: Boolean, lastType: String)
  case class Transition(user_id: Long, from_type: String, to_type: String,
      at_us: Long)

  private def toUs(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private[streaming] def update(key: Long, it: Iterator[StreamEv],
      state: GroupState[Buf]): Iterator[Transition] = {
    val prev = state.getOption.getOrElse(Buf(Nil, hasLast = false, null))
    val pending = prev.pending ++ it.map(e =>
      Pending(toUs(e.ts), e.event_id, e.event_type))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, hold) = pending.partition(_.tsUs < wmUs)
    val sorted = ready.sortBy(p => (p.tsUs, p.eventId))
    var hasLast = prev.hasLast
    var lastType = prev.lastType
    val out = List.newBuilder[Transition]
    for (p <- sorted) {
      if (hasLast) out += Transition(key, lastType, p.eventType, p.tsUs)
      hasLast = true
      lastType = p.eventType
    }
    state.update(Buf(hold, hasLast, lastType))
    if (hold.nonEmpty)
      // strictly above the current watermark by construction:
      // hold.tsUs >= wmUs, so tsUs/1000 >= wmMs and +1 clears it
      state.setTimeoutTimestamp(hold.map(_.tsUs).min / 1000L + 1L)
    out.result().iterator
  }

  /** Wire the stateful replay over a streaming event frame. The
    * watermark delay bounds both lateness tolerance and per-user buffer
    * size. */
  def transitions(events: DataFrame, watermarkDelay: String,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id")
      : Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).cast("string").as("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[StreamEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
