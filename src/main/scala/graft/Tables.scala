package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * Plain `spark.read.parquet` scans: column pruning and predicate pushdown
  * reach the parquet reader via Catalyst, so callers should select/filter on
  * these directly rather than pre-materializing projections. At cluster scale
  * the same loaders work against directory-partitioned layouts — nothing here
  * assumes single files.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects. Read nanos as long (runtime conf) and truncate to
    * microseconds — the same truncation DuckDB applies — so `ts` is a real
    * TimestampType column downstream. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    // floor division, not truncation: `div` rounds toward zero, which
    // would shift pre-epoch (negative) nanos forward a full microsecond
    // relative to DuckDB's floor semantics
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(
          "ts div 1000 - (case when ts % 1000 < 0 then 1 else 0 end)")))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
