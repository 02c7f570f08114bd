package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** J4 — raw-log archiving to day-partitioned compressed files
  * (reference RawLogSparkStreaming.scala:74-102 + its custom
  * append-mode AppendTextOutputFormat.scala:12-71).
  *
  * The file-sink commit log gives exactly-once appends, making the
  * reference's append-or-create OutputFormat hack obsolete; `dt` derives
  * from event time, fixing the driver-wall-clock misfiling near midnight
  * (RawLogSparkStreaming.scala:94 — SURVEY.md §7.5). Day partitioning
  * also gives partition pruning to every downstream reader.
  */
object RawArchive {

  /** Stamp an event-time day-bucket column. Records without a parseable
    * timestamp land in an explicit `unknown` partition — a null dt would
    * silently file them under __HIVE_DEFAULT_PARTITION__, invisible to
    * every day-scoped reader; an archive must lose nothing. */
  def withDayBucket(records: DataFrame, tsCol: String = "ts"): DataFrame =
    records.withColumn("dt",
      coalesce(date_format(col(tsCol), "yyyyMMdd"), lit("unknown")))

  /** Start the archive sink: parquet (columnar, splittable, snappy by
    * default — superseding the reference's snappy'd text), partitioned by
    * day, exactly-once via checkpoint. */
  def start(records: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    withDayBucket(records).writeStream
      .format("parquet")
      .partitionBy("dt")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("compression", "snappy")
      .trigger(trigger)
      .start()
}
