package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and time ≤ the left row's time.
  *
  * Spark has no native as-of operator (cf. pandas merge_asof, DuckDB
  * ASOF JOIN). The naive formulations are a fan-out equi-join + per-row
  * max (multiplies the left side by matches-per-key) or a range cross
  * join (quadratic). This implementation is the single-shuffle union
  * trick: tag both sides, union, sort each key's timeline once, and
  * carry the right side's value forward with a last-non-null running
  * window — cost is one shuffle on the key plus one per-key sort,
  * independent of matches-per-key.
  *
  * Tie semantics: with `inclusive = true` a right row AT the left row's
  * timestamp matches (time ≤ t) — right rows sort before left rows on
  * equal timestamps; with `inclusive = false` the match is strict
  * (time < t) — left rows sort first, so same-instant right rows are
  * invisible to them. Either way, ties among right rows at one
  * timestamp resolve to the maximum carried value, making the result
  * deterministic and equal to `max(value) over matching rows`.
  *
  * Scale: the window partitions by key — a key holding a large fraction
  * of both sides serializes into one task, the same bound as any keyed
  * window. `timeSliceSeconds` removes that bound: the timeline is cut
  * into ⌊epoch/s⌋ slices, the window partitions by (key, slice) — so a
  * hot key parallelizes across its slices — and the value carried
  * across slice boundaries is reconstructed from a per-(key, slice)
  * aggregate (one row per slice, map-side combined) with a tiny per-key
  * window over slices. Two keyed shuffles of the data instead of one;
  * worth it exactly when a key's timeline is too big for one task.
  */
object AsofJoin {

  /** For each left row: `valueCol`'s latest NON-NULL value at or before
    * `leftTime` among right rows sharing the key; null when no right row
    * with a non-null value precedes. A right row whose value is null does
    * NOT reset the lookup (unlike pandas merge_asof, which would surface
    * that row's NaN) — null-valued right rows are dropped up front, so the
    * contract is "latest non-null value", stated rather than an artifact
    * of the union encoding. Output: left's projection columns + `asofCol`.
    *
    * `timeSliceSeconds = Some(s)`: hot-key sub-bucketing (see class doc);
    * results are identical for any s > 0. */
  def asofLookup(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      valueCol: Column, asofCol: String,
      leftProjection: Seq[Column], inclusive: Boolean = true,
      timeSliceSeconds: Option[Long] = None): DataFrame = {
    val vType = right.select(valueCol).schema.head.dataType

    val reserved = Set("_k", "_t", "_is_left", "_v", "_slice", "_in", "_pv")
    require(!reserved.contains(asofCol),
      s"asofLookup: asofCol '$asofCol' collides with an internal column")
    for (c <- left.select(leftProjection: _*).columns)
      require(!reserved.contains(c),
        s"asofLookup: projection column '$c' collides with an internal column")
    timeSliceSeconds.foreach(s => require(s > 0,
      s"asofLookup: timeSliceSeconds must be positive, got $s"))

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

    // equal-timestamp order decides inclusivity: right-first ⇒ time ≤ t,
    // left-first ⇒ time < t; then by value so same-instant right
    // duplicates resolve to the maximum
    val sideOrder =
      if (inclusive) col("_is_left").asc else col("_is_left").desc
    val u = l.unionByName(r, allowMissingColumns = true)

    timeSliceSeconds match {
      case None =>
        val w = Window.partitionBy(col("_k"))
          .orderBy(col("_t"), sideOrder, col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn(asofCol, last(col("_v"), ignoreNulls = true).over(w))
          .filter(col("_is_left") === 1)
          .drop("_k", "_t", "_is_left", "_v")

      case Some(s) =>
        // Two-level plan. Slicing is monotone (t1 < t2 ⇒ slice(t1) ≤
        // slice(t2)) and equal timestamps share a slice, so a right row
        // in an EARLIER slice is strictly older than every row of this
        // slice — inclusivity only matters within a slice, where the
        // same side order applies.
        val us = u.withColumn("_slice",
          floor(unix_timestamp(col("_t")) / s))
        // level 1: the ordinary carry, confined to (key, slice)
        val wIn = Window.partitionBy(col("_k"), col("_slice"))
          .orderBy(col("_t"), sideOrder, col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // level 2: end-of-slice state per (key, slice) — the latest
        // (t, v) right row, a plain aggregate (map-side combined, one
        // row per slice) — carried across earlier slices by a per-key
        // window over SLICES (rows ∝ #slices, not #events, so the hot
        // key's serialized portion is negligible)
        val wCarry = Window.partitionBy(col("_k")).orderBy(col("_slice"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = us.groupBy(col("_k"), col("_slice"))
          .agg(max(when(col("_is_left") === 0,
            struct(col("_t"), col("_v")))).as("_end"))
          .withColumn("_prev",
            last(col("_end"), ignoreNulls = true).over(wCarry))
          .select(col("_k"), col("_slice"), col("_prev")("_v").as("_pv"))
        us.withColumn("_in", last(col("_v"), ignoreNulls = true).over(wIn))
          .join(carry, Seq("_k", "_slice"), "left")
          .withColumn(asofCol, coalesce(col("_in"), col("_pv")))
          .filter(col("_is_left") === 1)
          .drop("_k", "_t", "_is_left", "_v", "_slice", "_in", "_pv")
    }
  }
}
