package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-to-stream correlation — the impression↔click / request↔
  * response pattern: two live streams joined on a key with the match
  * window stated as an event-time interval.
  *
  * Spark's stream-stream join keeps BOTH sides in state until the
  * watermark proves no further match can arrive; an unbounded join
  * condition therefore means unbounded state. This operator makes the
  * two bounds explicit and mandatory: each side carries a watermark,
  * and the join condition pins `rightTime` into
  * `[leftTime - lowerSec, leftTime + upperSec]` — Spark derives the
  * state TTL from exactly this shape, so state per key is bounded by
  * (watermark delay + interval width) × arrival rate, independent of
  * stream lifetime.
  *
  * Scale shape: both streams shuffle on the join key per micro-batch
  * (the same exchange a batch join pays), state lives in the
  * configured store (RocksDB in [[graft.Engine]]) keyed by join key —
  * hot keys spread over `spark.sql.shuffle.partitions` tasks exactly
  * like batch; watermark-expired rows are evicted by the store, not
  * scanned. Outer variants emit the null-padded row only once the
  * watermark passes the interval end — correct, latency-bounded, and
  * identical to the batch outer join on the closed input.
  */
object StreamJoins {

  private val SupportedJoinTypes =
    Set("inner", "left_outer", "right_outer", "full_outer")

  /** Event-time interval join of two streams (also works batch-to-batch
    * — same plan, no watermark state; the spec proves stream ≡ batch).
    *
    * The sides must have disjoint column names (the result carries both
    * in full; prefix upstream if they collide). `lowerSec`/`upperSec`
    * bound `rightTime - leftTime` in seconds, both inclusive:
    * `intervalJoin(imps, clicks, ..., 0, 60)` matches clicks 0–60 s
    * AFTER their impression. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftDelay: String, rightDelay: String,
      lowerSec: Long, upperSec: Long,
      joinType: String = "inner"): DataFrame = {
    require(SupportedJoinTypes(joinType),
      s"intervalJoin: joinType must be one of " +
        s"${SupportedJoinTypes.mkString(", ")}, got '$joinType'")
    require(-lowerSec <= upperSec,
      s"intervalJoin: empty interval (lowerSec=$lowerSec upperSec=$upperSec)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: column names must be disjoint, both sides have " +
        overlap.mkString(", "))
    for ((df, c) <- Seq((left, leftKey), (left, leftTime),
      (right, rightKey), (right, rightTime)))
      require(df.columns.contains(c), s"intervalJoin: no column '$c'")
    val l = if (left.isStreaming) left.withWatermark(leftTime, leftDelay)
      else left
    val r = if (right.isStreaming) right.withWatermark(rightTime, rightDelay)
      else right
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $lowerSec SECOND") &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $upperSec SECOND"),
      joinType)
  }
}
