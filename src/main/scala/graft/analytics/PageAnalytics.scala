package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3 (page-view parsing) and its implied next step, plus J4's
  * day-partitioned layout as a queryable aggregate.
  */
object PageAnalytics {

  /** Page-jump counts from (last_page_id, page_id, next_page_id) triples —
    * the analysis the reference carries fields for but never finishes
    * (PageStreaming.scala:82-89). One hash aggregate over the triple. */
  def pageJumps(pageViews: DataFrame): DataFrame =
    pageViews
      .groupBy(col("last_page_id"), col("page_id"), col("next_page_id"))
      .agg(count(lit(1)).as("jumps"))

  /** Day-bucket + key counts — J4's `{topic}/{yyyyMMdd}` output layout
    * (RawLogSparkStreaming.scala:83-89) expressed as an aggregate over
    * event time (fixing the reference's driver-wall-clock bucketing,
    * SURVEY.md §7.5). Bucketing by event-time day means a re-run never
    * misfiles records across day directories. */
  def dayBuckets(events: DataFrame, ts: Column, key: Column): DataFrame =
    events
      .groupBy(date_format(ts, "yyyyMMdd").as("dt"), key.as("key"))
      .agg(count(lit(1)).as("n"))
}
