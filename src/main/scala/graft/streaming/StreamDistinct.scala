package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HllExprs

/** Streaming windowed distinct-count sketches — the ingestion-time
  * mirror of the x62 HLL relation: per event-time window and group,
  * maintain an HLL sketch of a key column and emit (window, group,
  * sketch, estimate) as windows seal.
  *
  * Why a sketch and not `approx_count_distinct`/`dropDuplicates`:
  * exact windowed distinct counting in a stream keeps one state row
  * per (window, group, KEY) — state ∝ distinct keys, the thing that
  * explodes at 100 TB-scale cardinality. The HLL aggregate keeps ONE
  * fixed-width register array per (window, group) — 2^p+1 bytes
  * regardless of cardinality — and because
  * [[graft.functions.HllExprs]]'s aggregate is a mergeable
  * `TypedImperativeAggregate`, the SAME kernel runs in batch (x62),
  * in streaming state, and in later rollups of the EMITTED sketches
  * (register max is commutative/associative/idempotent) — one
  * definition, no drift between the live counter and the nightly
  * recount.
  *
  * The emitted sketch column is the asset: persist it and later
  * rollups (per-day from per-hour, global from per-group) are register
  * merges over the tiny relation — the stream is never replayed.
  *
  * Watermark semantics are the standard windowed-aggregate contract:
  * `Append` mode emits a (window, group) row once, when the watermark
  * passes the window end.
  */
object StreamDistinct {

  /** Windowed HLL distinct sketches over a streaming DataFrame.
    *
    * @param events streaming input carrying `eventTimeCol`
    * @param key expression whose distinct count is sketched
    * @param grp grouping expression (beside the window)
    * @param windowDur e.g. "10 minutes"; `delay` the watermark delay
    * @param p sketch precision (2^p registers; x62's default 12 ⇒
    *   ~±1.6% and 4 KB per group-window)
    * @return window_start, window_end, `grp` as `grp_out`, `sketch`
    *   (binary, persistable/mergeable), `n_approx` (rounded estimate) */
  def windowedDistinct(events: DataFrame, key: Column, grp: Column,
      eventTimeCol: String, windowDur: String, delay: String,
      grpOut: String = "grp", p: Int = 12): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDur), grp.as(grpOut))
      .agg(HllExprs.hllSketch(xxhash64(key), p).as("sketch"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(grpOut),
        col("sketch"),
        round(HllExprs.hllEstimate(col("sketch"))).cast("long")
          .as("n_approx"))
}
