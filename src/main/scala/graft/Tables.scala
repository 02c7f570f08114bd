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

  /** `events.ts` has shipped as two physical types across harness data
    * generations: INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long via runtime conf, then floor-divide to
    * microseconds, the same truncation DuckDB applies) and plain
    * TIMESTAMP(MICROS) without a UTC flag (which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to a session-UTC TimestampType column so
    * every downstream window/lag/date_format sees one type and the DuckDB
    * oracle (NTZ wall-clock) formats identically. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor division, not truncation: `div` rounds toward zero, which
        // would shift pre-epoch (negative) nanos forward a full microsecond
        // relative to DuckDB's floor semantics
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(
              "ts div 1000 - (case when ts % 1000 < 0 then 1 else 0 end)")))
      case _ =>
        // TIMESTAMP or TIMESTAMP_NTZ parquet: under the engine's fixed UTC
        // session zone the NTZ->TZ cast is instant-preserving
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
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
