package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    val spark = events.sparkSession
    import spark.implicits._
    val st = stages.toArray
    val reached = funnelUsers(events, stages, userCol, tsCol, typeCol)
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

  /** Per-user funnel outcome behind [[funnel]]: the furthest stage
    * reached plus the first- and furthest-stage match times (µs) of the
    * earliest chain — the relation conversion-latency analyses run on
    * (see the funnel-duration percentile query). Same plan: one shuffle
    * on user, sorted-group scan, O(1) state.
    *
    * Output: (user_id, reached, first_us, last_us); the times are null
    * for users who never match stage 1. */
  def funnelUsers(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    val st = stages.toArray
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).cast("long").as("_1"),
        unix_micros(col(tsCol)).as("_2"), col(typeCol).as("_3"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"_2") { (u: Long, it: Iterator[(Long, Long, String)]) =>
        var cur = 0
        var first = Long.MinValue
        var last = Long.MinValue
        while (it.hasNext && cur < st.length) {
          val (_, t, ty) = it.next()
          if (ty == st(cur) && (cur == 0 || t > last)) {
            if (cur == 0) first = t
            last = t
            cur += 1
          }
        }
        Iterator.single((u, cur,
          if (cur >= 1) Some(first) else None,
          if (cur >= 1) Some(last) else None))
      }
      .toDF("user_id", "reached", "first_us", "last_us")
  }

  /** Floor-division day number (µs → days since epoch), exact for
    * pre-epoch timestamps too (plain `div` truncates toward zero). */
  private def floorDay(tsUs: org.apache.spark.sql.Column) =
    (tsUs - ((tsUs % 86400000000L) + 86400000000L) % 86400000000L) /
      86400000000L

  /** Event-flow transition counts (first-order Markov structure): how
    * often event type A is immediately followed by type B within a
    * user's timeline. The per-user order is (ts, event id) — the id
    * tiebreak makes equal-timestamp neighbours deterministic, so the
    * result is engine-replayable.
    *
    * Scale shape: one keyed exchange + one sort (lag window), then a
    * map-side-combinable count whose key space is |types|² — the same
    * single-exchange contract as sessionization.
    *
    * Output: (from_type, to_type, n_transitions). */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol),
        lag(col(typeCol), 1).over(w).as("_prev"))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Run-length collapse of a per-key value timeline (the SCD2 /
    * change-data-capture interval build): consecutive events with the
    * SAME value merge into one validity run carrying its start/end
    * times and event count. Runs restart whenever the value changes —
    * equal-timestamp order is pinned by the event-id tiebreak.
    *
    * Scale shape: the change flag (lag), the running run index
    * (cumulative sum), and the per-run aggregate all share ONE keyed
    * exchange and sort — identical to the sessionize plan; no
    * self-joins, no second shuffle.
    *
    * Output: (key, run_idx, value, start_ts, end_ts, n_events). */
  def valueRuns(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(unix_micros(col("_ts")), col("_id"))
    val prev = lag(col("value"), 1).over(w)
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(tsCol).as("_ts"),
        col(valCol).as("value"), col(idCol).as("_id"))
      .withColumn("_chg",
        when(prev.isNull || prev =!= col("value"), 1L).otherwise(0L))
      .withColumn("run_idx", sum(col("_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .groupBy(col("key"), col("run_idx"))
      .agg(first(col("value")).as("value"),
        min(col("_ts")).as("start_ts"),
        max(col("_ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  /** Incremental SCD2 maintenance: merge a batch of NEW events into a
    * persisted [[valueRuns]] history without rebuilding it. The
    * output is exactly `valueRuns(historyEvents ∪ delta)` — the last
    * (open) run of a key extends when the first delta value matches
    * it, closes and is followed by fresh runs otherwise — but the
    * cost is proportional to the DELTA, not the corpus:
    *
    *  - delta events run through the ordinary [[valueRuns]] plan
    *    (one keyed exchange over the batch);
    *  - history rows of keys the batch never touches stream through
    *    an anti join untouched — they never re-enter a window, never
    *    re-sort, and (when the batch's key set is small, the normal
    *    case) the anti/semi joins broadcast;
    *  - per touched key the only history state consulted is its LAST
    *    run, obtained with a map-side-combinable `max_by` aggregate —
    *    no window over history, no per-key history scan.
    *
    * Contract: every delta event must sort STRICTLY after every
    * history event of the same key under the (`tsCol`, `idCol`)
    * order — the standard CDC cutoff (split the feed at an ingest
    * timestamp). Interleaved late arrivals need a rebuild of the
    * affected keys, not this operator.
    *
    * `history` must have [[valueRuns]]'s schema
    * (key, run_idx, value, start_ts, end_ts, n_events); `delta` has
    * the raw event schema. Output: the merged history, same schema. */
  def mergeRuns(history: DataFrame, delta: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // delta-sized and consumed three times (first-run probe, shifted
    // re-emit); cached for the lifetime of the returned plan — the
    // caller owns unpersist, same contract as EditSimilarity
    val dRuns = valueRuns(delta, keyCol, tsCol, valCol, idCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one row per touched key: the batch's FIRST run carries the only
    // value the merge decision needs
    val d0 = dRuns.filter(col("run_idx") === 0L)
      .select(col("key"), col("value").as("_v0"))
    // last (open) run per touched key: ONE bounded aggregate, never a
    // window — max_by collapses map-side exactly like min/max. The
    // inner join is total (every touched key has a first delta run);
    // `_m` = "the open run extends" is decided once per key here.
    val last = history.join(d0, Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(max(col("run_idx")).as("_lri"),
        max_by(struct(col("value"), col("start_ts"), col("n_events")),
          col("run_idx")).as("_l"))
      .select(col("key"), col("_lri"), col("_l.start_ts").as("_lstart"),
        col("_l.n_events").as("_ln"), col("_l.value").as("_lval"))
      .join(d0, Seq("key"))
      .withColumn("_m", col("_v0") === col("_lval"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d = dRuns.join(last, Seq("key"), "left")
    val merges = col("run_idx") === 0L && col("_m")
    // keys absent from history keep their delta run numbering; known
    // keys shift past the history tail (one less when run 0 merged)
    val shift = when(col("_lri").isNull, lit(0L))
      .otherwise(col("_lri") + when(col("_m"), lit(0L)).otherwise(lit(1L)))
    val adjusted = d.select(col("key"),
      (col("run_idx") + shift).as("run_idx"),
      col("value"),
      when(merges, col("_lstart")).otherwise(col("start_ts")).as("start_ts"),
      col("end_ts"),
      (col("n_events") + when(merges, col("_ln")).otherwise(lit(0L)))
        .as("n_events"))
    // history passes through except the open run of a merging key,
    // which `adjusted` re-emits extended
    val mergedLast = last.filter(col("_m"))
      .select(col("key"), col("_lri"))
    val kept = history
      .join(mergedLast, Seq("key"), "left")
      .filter(col("_lri").isNull || col("run_idx") =!= col("_lri"))
      .select(col("key"), col("run_idx"), col("value"), col("start_ts"),
        col("end_ts"), col("n_events"))
    kept.unionByName(adjusted)
  }

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
