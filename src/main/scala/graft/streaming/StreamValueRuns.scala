package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 run collapse — the ingestion-time mirror of
  * [[graft.analytics.Funnels.valueRuns]], third instantiation of the
  * watermark-ordered replay contract ([[StreamTransitions]],
  * [[StreamFunnel]]): each user's sealed event prefix (below the
  * watermark, sorted by (ts, event id)) folds into the OPEN run —
  * same value extends it, a changed value CLOSES it and emits exactly
  * one validity-interval row. The final run of a key never closes (no
  * later value change can prove it over) — the same open-tail
  * semantics as streaming sessionization, where only sealed sessions
  * reach the sink.
  *
  * State per user: pending events inside the watermark horizon + one
  * open-run summary (value, start/end µs, count, run index) — never
  * history. Emitted rows equal the batch operator's CLOSED runs (all
  * but each user's last), spec-asserted on an out-of-order stream.
  *
  * Output: (user_id, run_idx, value, start_us, end_us, n_events). */
object StreamValueRuns {

  case class RunRow(user_id: Long, run_idx: Long, value: String,
      start_us: Long, end_us: Long, n_events: Long)
  case class RBuf(pending: List[StreamTransitions.Pending], hasOpen: Boolean,
      value: String, startUs: Long, endUs: Long, n: Long, idx: Long)

  private[streaming] def update(key: Long,
      it: Iterator[StreamTransitions.StreamEv],
      state: GroupState[RBuf]): Iterator[RunRow] = {
    val prev = state.getOption.getOrElse(
      RBuf(Nil, hasOpen = false, null, 0L, 0L, 0L, 0L))
    val pending = prev.pending ++ it.map(e =>
      StreamTransitions.Pending(
        e.ts.toInstant.getEpochSecond * 1000000L +
          e.ts.toInstant.getNano / 1000L,
        e.event_id, e.event_type))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, hold) = pending.partition(_.tsUs < wmUs)
    val sorted = ready.sortBy(p => (p.tsUs, p.eventId))
    var b = prev
    val out = List.newBuilder[RunRow]
    for (p <- sorted) {
      if (b.hasOpen && b.value == p.eventType)
        b = b.copy(endUs = p.tsUs, n = b.n + 1)
      else {
        if (b.hasOpen) {
          out += RunRow(key, b.idx, b.value, b.startUs, b.endUs, b.n)
          b = b.copy(idx = b.idx + 1)
        }
        b = b.copy(hasOpen = true, value = p.eventType,
          startUs = p.tsUs, endUs = p.tsUs, n = 1L)
      }
    }
    state.update(b.copy(pending = hold))
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(hold.map(_.tsUs).min / 1000L + 1L)
    out.result().iterator
  }

  def valueRuns(events: DataFrame, watermarkDelay: String,
      userCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "event_type", idCol: String = "event_id")
      : Dataset[RunRow] = {
    import events.sparkSession.implicits._
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("event_id"),
        col(valCol).cast("string").as("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[StreamTransitions.StreamEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
