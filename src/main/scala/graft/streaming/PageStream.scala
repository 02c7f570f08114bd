package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogParsers

/** J3 — page-view stream (reference PageStreaming.scala:23-93).
  *
  * The reference parses the page_topic JSON (7 fields, absent keys → "")
  * and stops at a `//todo` (PageStreaming.scala:89); the fields it carries
  * (last_page_id, page_id, next_page_id) exist for page-conversion
  * analysis. This job finishes that step: a running jump-count aggregate
  * per (last, current, next) page triple, the numerator/denominator
  * source for per-page conversion rates.
  *
  * Stateless parse → incremental keyed aggregate; keyspace is bounded by
  * |pages|³ in theory but by observed navigation edges in practice. For
  * an unbounded page universe, swap the aggregate for
  * flatMapGroupsWithState with a state TTL.
  */
object PageStream {

  /** Parse a raw-line streaming DataFrame into 7-field page views (single
    * JSON parse per record — the reference parses twice, SURVEY.md §7.5). */
  def parse(lines: DataFrame): DataFrame = LogParsers.parsePage(lines)

  /** Running page-jump counts per navigation triple (Update/Complete
    * output modes). Batch/stream agnostic — delegates to the analytics
    * aggregate. */
  def jumpCounts(pageViews: DataFrame): DataFrame =
    graft.analytics.PageAnalytics.pageJumps(pageViews)

  /** Per-page conversion rate: of the views of `page_id`, the share that
    * continued to each `next_page_id` (the analysis implied by
    * PageStreaming.scala:82-84). Requires the COMPLETE jump-count table
    * (a batch table, or a streaming aggregate in Complete output mode):
    * over an Update-mode micro-batch the per-page totals would cover
    * only the triples that batch touched, producing inflated rates. */
  def conversionRates(jumps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // window sum, not a groupBy + self-join: one pass, no duplicate
    // evaluation of the (possibly expensive) jumps relation
    val perPage = Window.partitionBy(col("page_id"))
    jumps
      .withColumn("page_total", sum(col("jumps")).over(perPage))
      .withColumn("conversion_rate",
        col("jumps").cast("double") / col("page_total").cast("double"))
      .select(col("page_id"), col("next_page_id"), col("jumps"),
        col("page_total"), col("conversion_rate"))
  }
}
