package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal band (range) join: pairs of rows sharing a key whose
  * timestamps lie within a tolerance of each other.
  *
  * Spark's planner turns `a.t BETWEEN b.t - tol AND b.t + tol` into a
  * key-equality join with the range as a post-join residual — fine — but
  * with NO equality key it degenerates to a nested-loop cross join, and
  * even with one, skewed keys pay the full per-key cross product before
  * filtering. The granule trick bounds the pair space structurally:
  * bucket both sides by ⌊epoch / tol⌋; any pair within `tol` seconds is
  * at most one bucket apart, so the left side probes its own bucket ±1
  * (a 3× explode of the probe side only) and an equi-join on
  * (key, bucket) + the exact residual filter finds every pair exactly
  * once — each right row lives in exactly one bucket, so no distinct
  * pass is needed. Shuffle volume: 3·|L| + |R|, candidates per probe
  * bounded by the key's rows per 2·tol window, never the key's total.
  */
object RangeJoin {

  /** Pairs with equal join key and |leftTime − rightTime| ≤ tolSec.
    * Output: leftProjection ++ rightProjection columns (alias them
    * disjointly — notably for self-joins). */
  def withinTolerance(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column, tolSec: Long,
      leftProjection: Seq[Column], rightProjection: Seq[Column])
      : DataFrame = {
    require(tolSec > 0, "withinTolerance: tolSec must be positive")
    // decimal epoch seconds, not unix_timestamp: unix_timestamp floors
    // to whole seconds, which would admit pairs up to tolSec+0.999s
    // apart; timestamp→decimal keeps exact microseconds. The interim
    // timestamp cast normalizes TIMESTAMP_NTZ/DATE inputs (NTZ casts
    // directly to numeric are rejected); session TZ is pinned UTC.
    def epochSec(t: Column) = t.cast("timestamp").cast("decimal(26,6)")
    val l = left.select((leftProjection :+ leftKey.as("_lk") :+
      epochSec(leftTime).as("_lt")): _*)
      .withColumn("_off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_lb", col("_off") + floor(col("_lt") / tolSec).cast("long"))
      .drop("_off")
    val r = right.select((rightProjection :+ rightKey.as("_rk") :+
      epochSec(rightTime).as("_rt")): _*)
      .withColumn("_rb", floor(col("_rt") / tolSec).cast("long"))
    // the KEY must be part of the equi-join: shuffling on the bucket
    // alone would funnel every key's rows of a 2·tol window through one
    // reducer (time-global skew)
    l.join(r, col("_lk") === col("_rk") && col("_lb") === col("_rb"))
      .filter(abs(col("_lt") - col("_rt")) <= tolSec)
      .drop("_lb", "_rb", "_lk", "_rk", "_lt", "_rt")
  }

  /** Per-row temporal neighbor count: for each row, how many OTHER rows
    * share its key within ±tolSec (the temporal-density feature
    * primitive; `includeSelf` keeps the self-match). `idCol` must be
    * unique per row; output is (id column, `n_near`), one row per input
    * row with a non-null key and time.
    *
    * Cost-routed on the per-key row count (a tiny pre-aggregate):
    * - keys at or below `maxRowsPerKeyForWindow` rows take a RANGE-frame
    *   window over exact epoch microseconds — count over
    *   [t − tol, t + tol] per key, ZERO joins and one keyed shuffle,
    *   with the usual keyed-window bound (a key sorts in one task,
    *   via the spilling external sort);
    * - above the bound, the granule-bucket self-join ([[withinTolerance]])
    *   aggregated by id — more stages, but a hot key's work is spread
    *   over its (key, bucket) granules instead of one task.
    * At corpus scale with low-cardinality keys the bucket route engages
    * automatically; both routes are exact and identical. */
  def neighborCounts(df: DataFrame, idCol: Column, key: Column,
      time: Column, tolSec: Long, includeSelf: Boolean = false,
      maxRowsPerKeyForWindow: Long = 10000000L): DataFrame = {
    require(tolSec > 0, "neighborCounts: tolSec must be positive")
    import org.apache.spark.sql.expressions.Window
    val idName = df.select(idCol).columns.head
    val self = if (includeSelf) 0L else 1L
    // exact epoch MICROsecond long: integral range-frame bounds, no
    // sub-second truncation (same normalization as withinTolerance)
    def epochUs(t: Column) =
      (t.cast("timestamp").cast("decimal(26,6)") * 1000000L).cast("long")

    val base = df.filter(key.isNotNull && time.isNotNull)
    val maxPerKey = base.groupBy(key).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    if (maxPerKey <= maxRowsPerKeyForWindow) {
      val w = Window.partitionBy(key).orderBy(epochUs(time))
        .rangeBetween(-tolSec * 1000000L, tolSec * 1000000L)
      base.select(idCol, (count(lit(1)).over(w) - self).as("n_near"))
    } else {
      withinTolerance(base, base, key, key, time, time, tolSec,
        Seq(idCol), Seq(lit(1).as("_one")))
        .groupBy(col(idName))
        .agg((count(lit(1)) - self).as("n_near"))
    }
  }
}
