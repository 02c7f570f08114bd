package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic log producers (reference RegisterProducer.scala:28-43,
  * QzLogProducer.scala:25-35, PageLogProducer.scala:23-32).
  *
  * The reference replays a static log file into Kafka with a per-partition
  * `KafkaProducer`; here the producer is a DataFrame write — drop files
  * into a directory watched by the file stream source locally, or
  * `df.write.format("kafka")` against a cluster. Generation is
  * deterministic (seeded by the row id) and distributed: `spark.range`
  * partitions the id space, every line is synthesized on executors —
  * nothing is collected or replayed through the driver.
  */
object FixtureProducers {

  /** register_topic TSV lines: `user_id \t platform_code \t create_time`
    * (FIXTURES.md §A). Platform cycles 1/2/3 (PC/APP/Other). */
  def registerLines(spark: SparkSession, n: Long,
      partitions: Int = 10): DataFrame =
    spark.range(0, n, 1, partitions).select(
      concat_ws("\t",
        col("id"),
        (col("id") % 3 + 1).cast("string"),
        date_format(
          timestamp_seconds(lit(1563206400L) + col("id") % 86400),
          "yyyy-MM-dd HH:mm:ss")).as("value"))

  /** qz_log TSV lines: `uid \t courseid \t pointid \t questionid \t
    * istrue \t createtime`. */
  def qzLines(spark: SparkSession, n: Long,
      partitions: Int = 10): DataFrame =
    spark.range(0, n, 1, partitions).select(
      concat_ws("\t",
        col("id") % 50,
        col("id") % 4,
        col("id") % 5,
        col("id") % 30,
        (col("id") % 2).cast("string"),
        date_format(
          timestamp_seconds(lit(1563206400L) + col("id") % 86400),
          "yyyy-MM-dd HH:mm:ss")).as("value"))

  /** page_topic JSON lines with the reference's 7 keys. */
  def pageLines(spark: SparkSession, n: Long,
      partitions: Int = 10): DataFrame =
    spark.range(0, n, 1, partitions).select(
      to_json(struct(
        col("id").cast("string").as("uid"),
        lit("app1").as("app_id"),
        concat(lit("dev"), col("id") % 7).as("device_id"),
        concat(lit("10.0.0."), col("id") % 255).as("ip"),
        (col("id") % 20).cast("string").as("last_page_id"),
        ((col("id") + 1) % 20).cast("string").as("page_id"),
        ((col("id") + 2) % 20).cast("string").as("next_page_id")))
        .as("value"))

  /** Drop lines as text files into `dir` — the local "producer send". */
  def produce(lines: DataFrame, dir: String): Unit =
    lines.write.mode("append").text(dir)
}
