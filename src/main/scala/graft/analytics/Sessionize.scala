package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a user's event stream splits into sessions
  * wherever the gap to the previous event exceeds `gapSec` — the
  * standard event-analytics primitive the reference's page pipeline
  * stops short of (it counts jumps but never groups them into visits).
  *
  * Plan shape: ONE exchange. Both windows (the lag flag and the running
  * session index) and the final per-session aggregate share the per-user
  * hash partitioning — the two Window operators stack on one sort, and
  * the groupBy keys (user, session) are clustered by the same exchange,
  * so Spark plans no second shuffle. Gaps compare exact epoch
  * MICROseconds (sub-second events are first-class; `unix_timestamp`
  * would truncate to seconds and merge sessions split by sub-second
  * boundaries).
  *
  * Tie handling is deterministic across engines: equal-timestamp events
  * all receive the same session index regardless of their (arbitrary)
  * order within the tie — exactly one row of a tie group carries the
  * new-session flag, and the running sum's default RANGE frame includes
  * the whole tie group at once. */
object Sessionize {

  /** Per-session rollup: (user_id, session_idx starting at 1 per user,
    * n_events, start_ts, end_ts). Rows with a null user or time are
    * dropped (they belong to no session). */
  def sessions(events: DataFrame, userCol: Column, tsCol: Column,
      gapSec: Long): DataFrame = {
    require(gapSec > 0, s"sessions: gapSec must be positive, got $gapSec")
    val base = events
      .select(userCol.as("_u"), tsCol.cast("timestamp").as("_t"))
      .filter(col("_u").isNotNull && col("_t").isNotNull)
      .withColumn("_us",
        (col("_t").cast("decimal(26,6)") * 1000000L).cast("long"))
    val w = Window.partitionBy(col("_u")).orderBy(col("_us"))
    val prev = lag(col("_us"), 1).over(w)
    val flagged = base.withColumn("_ns",
      when(prev.isNull || col("_us") - prev > gapSec * 1000000L, 1L)
        .otherwise(0L))
    // default RANGE frame: every member of a timestamp tie sees the
    // same running sum
    val sessed = flagged.withColumn("session_idx", sum(col("_ns")).over(w))
    sessed.groupBy(col("_u").as("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_t")).as("start_ts"), max(col("_t")).as("end_ts"))
  }
}
