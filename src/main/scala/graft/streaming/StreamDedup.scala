package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingestion-time mirror of
  * [[graft.operators.Dedup.exact]]: drop documents whose (normalized)
  * content was already seen, BEFORE they reach expensive downstream
  * stages (near-dup candidate generation, embedding, archiving).
  *
  * Two modes, both built on the state store (keyed by a 16-byte content
  * hash, so state rows are fixed-width regardless of document size):
  *
  * - [[dedupForever]]: `dropDuplicates` over the content hash — state
  *   grows with the number of DISTINCT documents ever seen (that is the
  *   contract of global dedup; RocksDB keeps it on disk, and the 16-byte
  *   key means a billion distinct documents is ~16 GB of state across
  *   the cluster, not heap).
  * - [[dedupWithinWatermark]]: `dropDuplicatesWithinWatermark` — exact
  *   dedup only within the event-time watermark horizon, after which
  *   state is evicted. The standard choice when duplicates arrive close
  *   together (retries, replays, crawler revisits) and unbounded state
  *   is not acceptable.
  */
object StreamDedup {

  /** The fixed-width state key: the SAME content-identity hash the
    * batch pass groups on ([[graft.operators.Dedup.contentHash]]). */
  private def contentHash(textCol: String) =
    graft.operators.Dedup.contentHash(col(textCol))

  private def requireNoHashCol(docs: DataFrame): Unit =
    require(!docs.columns.contains("_h"),
      "StreamDedup: input already carries a '_h' column (the internal " +
        "content-hash name) — rename it first")

  /** Global streaming dedup: first occurrence of each distinct content
    * passes, every later one is dropped. State ∝ distinct contents. */
  def dedupForever(docs: DataFrame, textCol: String = "text"): DataFrame = {
    requireNoHashCol(docs)
    docs.withColumn("_h", contentHash(textCol))
      .dropDuplicates("_h")
      .drop("_h")
  }

  /** Watermark-bounded streaming dedup: duplicates are dropped while
    * their first occurrence is inside the watermark horizon; state for
    * older contents is evicted. `eventTimeCol` must be a timestamp
    * column; `delay` is the standard watermark delay string. */
  def dedupWithinWatermark(docs: DataFrame, eventTimeCol: String,
      delay: String, textCol: String = "text"): DataFrame = {
    requireNoHashCol(docs)
    docs.withColumn("_h", contentHash(textCol))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")
  }
}
