package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable raw-line stream ingestion (SURVEY.md §2.1, §7.4 risk 5).
  *
  * The reference hard-wires Kafka at compile time (`MyKafkaUtil.scala`);
  * here the transport is a config value, so the same pipeline runs off a
  * directory of log files locally and a Kafka cluster in production —
  * nothing downstream changes. Rate limiting maps to the per-source
  * trigger cap (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`),
  * replacing `spark.streaming.kafka.maxRatePerPartition` +
  * backpressure (reference RegisterStreaming.scala:28-33).
  *
  * Offset/resume state is the query's `checkpointLocation` in every
  * case — the reference's MySQL `offset_manager` has no equivalent here
  * by design (SURVEY.md §7.3).
  */
object StreamSources {

  /** Transport + its options. Examples:
    *   SourceConfig("text", Map("path" -> "/data/register",
    *     "maxFilesPerTrigger" -> "10"))
    *   SourceConfig("kafka", Map("kafka.bootstrap.servers" -> "...",
    *     "subscribe" -> "register_topic",
    *     "startingOffsets" -> "earliest",
    *     "maxOffsetsPerTrigger" -> "3000"))
    */
  case class SourceConfig(format: String,
      options: Map[String, String] = Map.empty)

  /** Streaming DataFrame with a single string `value` column. */
  def lines(spark: SparkSession, cfg: SourceConfig): DataFrame =
    cfg.format match {
      case "text" =>
        require(cfg.options.contains("path"),
          "StreamSources: format \"text\" requires a \"path\" option " +
            "(directory to watch)")
        spark.readStream.options(cfg.options - "path")
          .text(cfg.options("path"))
          .toDF("value")
      case "kafka" =>
        // config-only: resolved through the DataSource registry at
        // runtime (needs the spark-sql-kafka connector on the cluster
        // classpath; none is present in the test environment)
        spark.readStream.format("kafka").options(cfg.options).load()
          .selectExpr("CAST(value AS STRING) AS value")
      case other =>
        spark.readStream.format(other).options(cfg.options).load()
          .selectExpr("CAST(value AS STRING) AS value")
    }
}
