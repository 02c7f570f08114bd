package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogParsers

/** J1 — registration analytics over an unbounded line stream
  * (reference RegisterStreaming.scala:66-101, rebuilt on event time).
  *
  * The reference computes two aggregations off one cached DStream: a
  * 60s/6s processing-time sliding window and an unbounded cumulative
  * count. Here both are declarative streaming aggregations over the same
  * parsed stream; the state store replaces `updateStateByKey`'s full-state
  * scan with incremental per-key updates, and the watermark bounds window
  * state (the reference has no late-data story at all — SURVEY.md §2.8).
  */
object RegisterStream {

  /** Parse a raw-line streaming DataFrame into typed register events. */
  def parse(lines: DataFrame): DataFrame = LogParsers.parseRegister(lines)

  /** Sliding-window per-platform counts (event-time, watermarked).
    * Append-mode compatible: windows finalize when the watermark passes. */
  def windowedCounts(registers: DataFrame, windowDur: String = "60 seconds",
      slideDur: String = "6 seconds",
      watermark: String = "30 seconds"): DataFrame =
    registers
      .withWatermark("createTime", watermark)
      .groupBy(window(col("createTime"), windowDur, slideDur),
        col("platform"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("platform"), col("n"))

  /** Cumulative per-platform totals since stream start (the
    * `updateStateByKey` equivalent): a running aggregate for
    * Update/Complete output mode. Keyspace = #platforms (tiny), so
    * Complete mode is safe here; for large keyspaces use
    * flatMapGroupsWithState with timeouts instead. */
  def cumulativeCounts(registers: DataFrame): DataFrame =
    registers.groupBy(col("platform")).agg(count(lit(1)).as("total"))
}
