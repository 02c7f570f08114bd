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

  /** Single-read dual aggregation (reference parity: one cached DStream
    * feeding both aggregations, RegisterStreaming.scala:88-101). One
    * foreachBatch computes BOTH aggregates per micro-batch from one
    * persisted batch and appends their *contributions* — both aggregates
    * are additive across batches (a window's count is the sum of each
    * batch's rows landing in it), so the read views below just sum.
    * Idempotence: contributions are partitioned by batch_id with dynamic
    * partition overwrite — a replayed batch overwrites its own partition,
    * never double-counts (unlike the reference, SURVEY.md §2.8). */
  def dualSink(parsed: DataFrame, outDir: String, checkpoint: String,
      windowDur: String = "60 seconds", slideDur: String = "6 seconds")
      : org.apache.spark.sql.streaming.StreamingQuery =
    parsed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // rows without a parseable timestamp would be dropped by the
        // window expansion but counted by the totals — exclude them from
        // both so the two aggregates describe the same event set
        val b = batch.filter(col("createTime").isNotNull).persist()
        try {
          b.groupBy(window(col("createTime"), windowDur, slideDur),
              col("platform"))
            .agg(count(lit(1)).as("n"))
            .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("platform"), col("n"), lit(batchId).as("batch_id"))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/windowed")
          b.groupBy(col("platform")).agg(count(lit(1)).as("n"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/totals")
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One batch_id partition accrues per micro-batch; long-running streams
    * should periodically compact contributions older than the checkpoint
    * horizon (sum them into one retired partition) — replay can only
    * touch batch ids at or after the last checkpointed offset commit, so
    * compaction below that watermark never races the overwrite. */
  private def contributions(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit schema: robust to a not-yet-created store and to a store
    // that has only seen empty batches (no parquet footers to infer from)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private val windowedSchema =
    "window_start timestamp, window_end timestamp, platform string, " +
      "n bigint, batch_id bigint"
  private val totalsSchema = "platform string, n bigint, batch_id bigint"

  /** Batches committed to BOTH stores. The two writes of one batch are
    * not atomic together, so a reader racing batch N's commit could see
    * its windowed contribution but not yet its totals; restricting every
    * view to the common batch-id set keeps the two views describing the
    * same event set at all times. */
  private def committedBoth(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    contributions(spark, s"$outDir/windowed", windowedSchema)
      .select(col("batch_id")).distinct()
      .join(contributions(spark, s"$outDir/totals", totalsSchema)
        .select(col("batch_id")).distinct(), Seq("batch_id"), "inner")

  /** Read view over [[dualSink]]'s windowed contributions. Empty (with
    * the right schema) before the first batch commits. */
  def windowedView(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    contributions(spark, s"$outDir/windowed", windowedSchema)
      .join(committedBoth(spark, outDir), Seq("batch_id"), "left_semi")
      .groupBy(col("window_start"), col("window_end"), col("platform"))
      .agg(sum(col("n")).as("n"))

  /** Read view over [[dualSink]]'s cumulative contributions. Empty (with
    * the right schema) before the first batch commits. */
  def totalsView(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    contributions(spark, s"$outDir/totals", totalsSchema)
      .join(committedBoth(spark, outDir), Seq("batch_id"), "left_semi")
      .groupBy(col("platform")).agg(sum(col("n")).as("total"))
}
