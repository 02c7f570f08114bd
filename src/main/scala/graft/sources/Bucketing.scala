package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * A fact⋈fact join (e.g. lineitem⋈orders on the order key) shuffles
  * both sides on every query. Writing both tables bucketed AND sorted by
  * the join key moves that shuffle to write time, once: every subsequent
  * join on the key runs as a sort-merge join with NO exchange on either
  * side — at 100 TB that is the difference between re-shuffling
  * terabytes per query and a pure map-side merge. Bucket counts must
  * match across co-bucketed tables (Spark requires it to align bucket
  * files one-to-one).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
