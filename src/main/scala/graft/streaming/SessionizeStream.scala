package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the ingestion-time mirror of
  * [[graft.analytics.Sessionize]]: per-user sessions close when the
  * event-time gap to the next event exceeds `gapSec`, computed
  * incrementally with Spark's native `session_window` state (merging
  * session state per key, watermark-driven finalization) instead of the
  * batch operator's lag/cumsum windows.
  *
  * Boundary semantics are aligned EXACTLY with the batch operator:
  * batch starts a new session when the gap is strictly greater than
  * `gapSec`, while `session_window`'s windows are end-exclusive (a gap
  * of exactly `gapSec` would split). Passing the gap as
  * `gapSec·10⁶ + 1` microseconds makes "gap < gap'" ≡ "gap ≤ gapSec"
  * at Spark's microsecond timestamp resolution, so a finished stream
  * emits byte-identical sessions to the batch pass (the spec asserts
  * it). `session_idx` is inherently a batch notion (it requires the
  * user's full history); the streaming output identifies sessions by
  * (user_id, start_ts) instead.
  *
  * Scale shape: one keyed exchange on user_id; state is one merging
  * session per open (user, window), evicted once the watermark passes a
  * session's close — state ∝ concurrently-open sessions, not history.
  * Output rows appear when their session seals (append mode).
  *
  * Output: user_id, n_events, start_ts, end_ts (event-time min/max, as
  * in the batch rollup — not the padded window bounds).
  */
object SessionizeStream {

  def sessions(events: DataFrame, userCol: Column, tsCol: Column,
      gapSec: Long, watermarkDelay: String): DataFrame = {
    require(gapSec > 0, s"sessions: gapSec must be positive, got $gapSec")
    val gap = s"${gapSec * 1000000L + 1L} microseconds"
    events
      .select(userCol.as("user_id"), tsCol.cast("timestamp").as("_t"))
      .filter(col("user_id").isNotNull && col("_t").isNotNull)
      .withWatermark("_t", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("_t"), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col("_t")).as("start_ts"), max(col("_t")).as("end_ts"))
      .select(col("user_id"), col("n_events"),
        col("start_ts"), col("end_ts"))
  }
}
