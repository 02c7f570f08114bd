package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event product analytics over the event log: funnel
  * conversion and cohort retention.
  *
  * Reference scope: the reference's analytics are per-key counters over
  * a single event kind (register counts, qz mastery); funnels and
  * retention are the canonical cross-event extensions every event
  * pipeline grows next — "how many users progress view → click →
  * purchase" and "how many users come back in week N".
  */
object Funnels {

  /** Earliest-chain funnel: a user reaches stage k when events matching
    * `stages(0..k-1)` exist at strictly increasing timestamps, chained
    * greedily from each stage's earliest qualifying occurrence
    * (t₁ = min ts of stage 1, t₂ = min ts of stage 2 after t₁, …) —
    * the classic product-analytics recurrence, deterministic for any
    * tie order because matches advance only on strictly larger
    * microsecond timestamps.
    *
    * Scale shape: ONE shuffle (hash on user), then a sorted-group
    * streaming scan with O(1) state per user (stage cursor + last match
    * time) — the same execution contract as sessionization and packing;
    * no per-stage join rounds, no window re-sorts. The per-stage
    * summary is a k-row aggregate. A k-stage funnel over 10¹² events
    * costs one event-table shuffle regardless of k.
    *
    * Output: (stage_idx 1-based, stage, n_users reaching ≥ that stage),
    * one row per stage, zero-count stages included. */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    val st = stages.toArray
    val reached = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).cast("long").as("_1"),
        unix_micros(col(tsCol)).as("_2"), col(typeCol).as("_3"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"_2") { (u: Long, it: Iterator[(Long, Long, String)]) =>
        var cur = 0
        var last = Long.MinValue
        while (it.hasNext && cur < st.length) {
          val (_, t, ty) = it.next()
          if (ty == st(cur) && (cur == 0 || t > last)) { last = t; cur += 1 }
        }
        Iterator.single((u, cur))
      }
      .toDF("u", "reached")
    val counts = reached.filter(col("reached") >= 1)
      .select(explode(sequence(lit(1), col("reached"))).as("stage_idx"))
      .groupBy(col("stage_idx")).agg(count(lit(1)).as("n_users"))
    // k-row stage spine (driver-side literals, not data) keeps
    // zero-conversion stages visible
    val spine = st.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toSeq.toDF("stage_idx", "stage")
    spine.join(counts, Seq("stage_idx"), "left")
      .select(col("stage_idx").cast("long"), col("stage"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Floor-division day number (µs → days since epoch), exact for
    * pre-epoch timestamps too (plain `div` truncates toward zero). */
  private def floorDay(tsUs: org.apache.spark.sql.Column) =
    (tsUs - ((tsUs % 86400000000L) + 86400000000L) % 86400000000L) /
      86400000000L

  /** Cohort retention: users grouped by the week of their FIRST event
    * (cohort), counted distinct in each subsequent week offset. Weeks
    * are 7-day blocks of days-since-epoch — pure integer arithmetic,
    * engine-independent (no calendar/timezone semantics to disagree
    * on).
    *
    * Scale shape: first-seen is one map-side-combinable min aggregate
    * shuffled on user; the join back is co-partitioned on the same key
    * (one exchange each side, AQE broadcasts the first-seen side when
    * small); the distinct-user count shuffles (cohort_week, week_offset,
    * user) once. Nothing is ever collected; output rows = #cohorts ×
    * #offsets.
    *
    * Output: (cohort_week, week_offset, n_users). */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("u"),
        floorDay(unix_micros(col(tsCol))).cast("long").as("d"))
    val first = e.groupBy(col("u")).agg(min(col("d")).as("d0"))
    e.join(first, Seq("u"))
      .groupBy(floor(col("d0") / 7).cast("long").as("cohort_week"),
        floor((col("d") - col("d0")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
