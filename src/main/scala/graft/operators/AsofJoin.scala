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
  * of both sides serializes into one task (the same bound as any keyed
  * window); pre-filter or sub-bucket such keys upstream.
  */
object AsofJoin {

  /** For each left row: `valueCol`'s latest NON-NULL value at or before
    * `leftTime` among right rows sharing the key; null when no right row
    * with a non-null value precedes. A right row whose value is null does
    * NOT reset the lookup (unlike pandas merge_asof, which would surface
    * that row's NaN) — null-valued right rows are dropped up front, so the
    * contract is "latest non-null value", stated rather than an artifact
    * of the union encoding. Output: left's projection columns + `asofCol`. */
  def asofLookup(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      valueCol: Column, asofCol: String,
      leftProjection: Seq[Column], inclusive: Boolean = true): DataFrame = {
    val vType = right.select(valueCol).schema.head.dataType

    val reserved = Set("_k", "_t", "_is_left", "_v")
    require(!reserved.contains(asofCol),
      s"asofLookup: asofCol '$asofCol' collides with an internal column")

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
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), sideOrder, col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asofCol, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .drop("_k", "_t", "_is_left", "_v")
  }
}
