package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Keyed upsert into a parquet table — the engine's replacement for the
  * reference's per-row `insert … on duplicate key update` into MySQL
  * `qz_point_detail` (QzPointStreaming.scala:179-182, via
  * SqlProxy.scala:27-41).
  *
  * Each upsert merges a batch of full-state rows into the table:
  * existing rows whose key appears in the batch are replaced
  * (last-writer-wins), others are kept. Because the streaming mastery
  * rows are complete per-key snapshots (not deltas), replaying a batch
  * rewrites identical rows — idempotent, unlike the reference's
  * read-add-write which double-counts on replay (SURVEY.md §2.8).
  *
  * The swap is write-to-temp + rename, which is not atomic for
  * concurrent readers on a plain filesystem; production deployments put
  * a transactional table format underneath the same `upsert` contract.
  * State-of-record remains the state store — the table is a queryable
  * projection, so losing a swap race costs a re-read, never state.
  */
object KeyedUpsertSink {

  /** Merge `rows` into the keyed parquet table at `tableDir`. */
  def upsert(rows: DataFrame, tableDir: String, keys: Seq[String]): Unit = {
    val spark = rows.sparkSession
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val merged =
      if (fs.exists(dir)) {
        val existing = spark.read.parquet(tableDir)
        existing
          .join(rows.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(rows)
      } else rows

    val tmp = new Path(tableDir + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    if (!fs.rename(tmp, dir))
      throw new java.io.IOException(s"rename $tmp -> $dir failed")
  }

  /** foreachBatch hook: upsert every micro-batch of full-state rows. */
  def foreachBatchUpsert(tableDir: String, keys: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch, _) => if (!batch.isEmpty) upsert(batch, tableDir, keys)
}
