package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and time ≤ the left row's time (backward), or
  * the earliest with time ≥ it ([[asofLookupForward]]) — optionally
  * only within a time tolerance (the pandas `merge_asof`
  * direction/tolerance surface).
  *
  * Spark has no native as-of operator (cf. pandas merge_asof, DuckDB
  * ASOF JOIN). The naive formulations are a fan-out equi-join + per-row
  * max (multiplies the left side by matches-per-key) or a range cross
  * join (quadratic). This implementation is the single-shuffle union
  * trick: tag both sides, union, sort each key's timeline once, and
  * carry the right side's (time, value) forward with a last-non-null
  * running window — cost is one shuffle on the key plus one per-key
  * sort, independent of matches-per-key. The forward direction runs
  * the SAME plan with the frame and tie order mirrored (currentRow →
  * unboundedFollowing, first non-null) — no second code path to
  * diverge.
  *
  * Tie semantics (backward): with `inclusive = true` a right row AT
  * the left row's timestamp matches (time ≤ t) — right rows sort
  * before left rows on equal timestamps; with `inclusive = false` the
  * match is strict (time < t). Forward mirrors: inclusive ⇒ time ≥ t.
  * Either way, ties among right rows at one timestamp resolve to the
  * maximum carried value, making the result deterministic and equal to
  * `max(value) over matching rows at the matched instant`.
  *
  * Tolerance: `toleranceSec = Some(s)` nulls the lookup when the
  * matched right row is more than `s` seconds away (inclusive bound,
  * exact decimal epoch arithmetic — sub-second timestamps compare
  * exactly). The match itself is unchanged: tolerance filters the
  * SELECTED row, it does not fall back to an older/newer one (the
  * merge_asof contract).
  *
  * Scale: the window partitions by key — a key holding a large fraction
  * of both sides serializes into one task, the same bound as any keyed
  * window. `timeSliceSeconds` removes that bound: the timeline is cut
  * into ⌊epoch/s⌋ slices, the window partitions by (key, slice) — so a
  * hot key parallelizes across its slices — and the state carried
  * across slice boundaries is reconstructed from a per-(key, slice)
  * aggregate (one row per slice, map-side combined) with a tiny per-key
  * window over slices. Two keyed shuffles of the data instead of one;
  * worth it exactly when a key's timeline is too big for one task.
  */
object AsofJoin {

  /** For each left row: `valueCol`'s latest NON-NULL value at or before
    * `leftTime` among right rows sharing the key; null when no right row
    * with a non-null value precedes (or none within `toleranceSec`). A
    * right row whose value is null does NOT reset the lookup (unlike
    * pandas merge_asof, which would surface that row's NaN) —
    * null-valued right rows are dropped up front, so the contract is
    * "latest non-null value", stated rather than an artifact of the
    * union encoding. Output: left's projection columns + `asofCol`.
    *
    * `timeSliceSeconds = Some(s)`: hot-key sub-bucketing (see class doc);
    * results are identical for any s > 0. */
  def asofLookup(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      valueCol: Column, asofCol: String,
      leftProjection: Seq[Column], inclusive: Boolean = true,
      timeSliceSeconds: Option[Long] = None,
      toleranceSec: Option[Long] = None): DataFrame =
    lookup(left, right, leftKey, rightKey, leftTime, rightTime, valueCol,
      asofCol, leftProjection, inclusive, timeSliceSeconds, toleranceSec,
      forward = false)

  /** The FORWARD direction: `valueCol`'s earliest non-null value at or
    * after `leftTime` (strictly after with `inclusive = false`) — the
    * next-event lookup (next price tick, next maintenance window, next
    * scheduled run). Same plan, frame and tie order mirrored; same
    * tolerance and hot-key slicing semantics. */
  def asofLookupForward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      valueCol: Column, asofCol: String,
      leftProjection: Seq[Column], inclusive: Boolean = true,
      timeSliceSeconds: Option[Long] = None,
      toleranceSec: Option[Long] = None): DataFrame =
    lookup(left, right, leftKey, rightKey, leftTime, rightTime, valueCol,
      asofCol, leftProjection, inclusive, timeSliceSeconds, toleranceSec,
      forward = true)

  /** Exact decimal epoch seconds (sub-second-safe, no double rounding —
    * the [[RangeJoin]] discipline). */
  private def epochSec(t: Column): Column =
    t.cast("timestamp").cast("decimal(26,6)")

  private def lookup(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      valueCol: Column, asofCol: String,
      leftProjection: Seq[Column], inclusive: Boolean,
      timeSliceSeconds: Option[Long], toleranceSec: Option[Long],
      forward: Boolean): DataFrame = {
    val vType = right.select(valueCol).schema.head.dataType

    val reserved = Set("_k", "_t", "_is_left", "_v", "_slice", "_in",
      "_pv", "_m", "_end", "_prev")
    require(!reserved.contains(asofCol),
      s"asofLookup: asofCol '$asofCol' collides with an internal column")
    for (c <- left.select(leftProjection: _*).columns)
      require(!reserved.contains(c),
        s"asofLookup: projection column '$c' collides with an internal column")
    timeSliceSeconds.foreach(s => require(s > 0,
      s"asofLookup: timeSliceSeconds must be positive, got $s"))
    toleranceSec.foreach(s => require(s >= 0,
      s"asofLookup: toleranceSec must be >= 0, got $s"))
    if (forward && timeSliceSeconds.isDefined)
      require(vType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        "asofLookupForward with timeSliceSeconds needs a NUMERIC value " +
          s"column (same-instant ties break via negation), got $vType")

    val l = left.select((leftProjection :+
      leftKey.as("_k") :+ leftTime.as("_t")): _*)
      .withColumn("_is_left", lit(1))
      .withColumn("_v", lit(null).cast(vType))
    require(!l.columns.contains(asofCol),
      s"asofLookup: asofCol '$asofCol' collides with a projection column")

    // equi-join semantics: right rows with a null key or null timestamp
    // match nothing (SQL NULL never equals/compares) — without this
    // filter they sort to the partition head (nulls-first) and their
    // value would be served as 'infinitely old' state to every left
    // row, and null keys would match each other via partitionBy.
    // Null VALUES are dropped too: in the union encoding they are
    // indistinguishable from left marker rows, so they cannot reset the
    // carried value — dropping them makes the documented "latest
    // non-null value" contract explicit
    val r = right.select(rightKey.as("_k"), rightTime.as("_t"),
      valueCol.cast(vType).as("_v"))
      .filter(col("_k").isNotNull && col("_t").isNotNull &&
        col("_v").isNotNull)
      .withColumn("_is_left", lit(0))

    // the carried state is the matched (time, value) STRUCT — the time
    // feeds the tolerance test; ordering right ties by _v makes the
    // carried row the max-value one in both directions
    def matched = when(col("_is_left") === 0,
      struct(col("_t").as("_mt"), col("_v").as("_mv")))

    // equal-timestamp order decides inclusivity. Backward: right-first
    // ⇒ time ≤ t. Forward (frame looks ahead from the current row):
    // LEFT-first ⇒ the same-instant right row is inside the frame ⇒
    // time ≥ t.
    val rightFirst = if (forward) !inclusive else inclusive
    val sideOrder =
      if (rightFirst) col("_is_left").asc else col("_is_left").desc
    // tie order among right rows: the frame edge nearest the left row
    // must carry the MAX value — ascending _v for a backward `last`,
    // descending for a forward `first`
    val valOrder = if (forward) col("_v").desc else col("_v").asc
    def pick(c: Column, w: org.apache.spark.sql.expressions.WindowSpec) =
      if (forward) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)
    def frame(w: org.apache.spark.sql.expressions.WindowSpec) =
      if (forward) w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = l.unionByName(r, allowMissingColumns = true)

    // tolerance applies to the SELECTED row's gap (exact decimal secs)
    def applyTolerance(m: Column): Column = {
      val gap =
        if (forward) epochSec(m("_mt")) - epochSec(col("_t"))
        else epochSec(col("_t")) - epochSec(m("_mt"))
      toleranceSec match {
        case Some(s) => when(gap <= lit(s), m("_mv"))
        case None => m("_mv")
      }
    }

    timeSliceSeconds match {
      case None =>
        val w = frame(Window.partitionBy(col("_k"))
          .orderBy(col("_t"), sideOrder, valOrder))
        u.withColumn("_m", pick(matched, w))
          .withColumn(asofCol, applyTolerance(col("_m")))
          .filter(col("_is_left") === 1)
          .drop("_k", "_t", "_is_left", "_v", "_m")

      case Some(s) =>
        // Two-level plan. Slicing is monotone (t1 < t2 ⇒ slice(t1) ≤
        // slice(t2)) and equal timestamps share a slice, so a right row
        // in an EARLIER slice (backward; LATER forward) is strictly on
        // the matching side of every row of this slice — inclusivity
        // only matters within a slice, where the same side order
        // applies.
        val us = u.withColumn("_slice",
          floor(unix_timestamp(col("_t")) / s))
        // level 1: the ordinary carry, confined to (key, slice)
        val wIn = frame(Window.partitionBy(col("_k"), col("_slice"))
          .orderBy(col("_t"), sideOrder, valOrder))
        // level 2: boundary state per (key, slice) — the nearest right
        // row of each slice (latest backward / earliest forward), a
        // plain aggregate (map-side combined, one row per slice) —
        // carried across slices by a per-key window over SLICES (rows ∝
        // #slices, not #events, so the hot key's serialized portion is
        // negligible)
        val edgeAgg =
          if (forward) min(when(col("_is_left") === 0,
            struct(col("_t").as("_mt"), (-col("_v")).as("_nv"))))
          else max(when(col("_is_left") === 0,
            struct(col("_t").as("_mt"), col("_v").as("_mv"))))
        val wCarry =
          if (forward)
            Window.partitionBy(col("_k")).orderBy(col("_slice"))
              .rowsBetween(1, Window.unboundedFollowing)
          else
            Window.partitionBy(col("_k")).orderBy(col("_slice"))
              .rowsBetween(Window.unboundedPreceding, -1)
        val carryRaw = us.groupBy(col("_k"), col("_slice"))
          .agg(edgeAgg.as("_end"))
        // forward edge: min over (t, -v) picks earliest t with MAX v at
        // that t; un-negate into the shared (_mt, _mv) shape
        val carryShaped =
          if (forward) carryRaw.withColumn("_end",
            when(col("_end").isNotNull,
              struct(col("_end")("_mt").as("_mt"),
                (-col("_end")("_nv")).as("_mv"))))
          else carryRaw
        val carry = carryShaped
          .withColumn("_prev", pick(col("_end"), wCarry))
          .select(col("_k"), col("_slice"), col("_prev").as("_pv"))
        us.withColumn("_in", pick(matched, wIn))
          .join(carry, Seq("_k", "_slice"), "left")
          .withColumn("_m", coalesce(col("_in"), col("_pv")))
          .withColumn(asofCol, applyTolerance(col("_m")))
          .filter(col("_is_left") === 1)
          .drop("_k", "_t", "_is_left", "_v", "_slice", "_in", "_pv", "_m")
    }
  }
}
