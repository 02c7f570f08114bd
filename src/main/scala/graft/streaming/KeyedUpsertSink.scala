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
  * The swap is recoverable: write-to-temp, retire the live generation to
  * `<dir>.old`, rename temp into place, drop `.old`. A crash at any
  * point leaves either the live dir or a complete predecessor
  * (`.old`/`.tmp`) on disk, and the next upsert's recovery step restores
  * it before merging — so a replayed batch always merges against the
  * full prior table, never against itself alone. Rename is still not
  * atomic for *concurrent readers* on a plain filesystem; production
  * deployments put a transactional table format underneath the same
  * `upsert` contract. State-of-record remains the state store — the
  * table is a queryable projection.
  */
object KeyedUpsertSink {

  /** Restore the live table dir after a crashed swap. Invariants of the
    * swap protocol: `.tmp` is only renamed over a *retired* dir, so if
    * the live dir is missing, a committed `.tmp` (has _SUCCESS) is the
    * newest complete generation, else `.old` is. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      old: Path, tmp: Path): Unit = {
    if (!fs.exists(dir)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        if (!fs.rename(tmp, dir))
          throw new java.io.IOException(s"recovery rename $tmp -> $dir failed")
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        fs.delete(tmp, true)
        if (!fs.rename(old, dir))
          throw new java.io.IOException(s"recovery rename $old -> $dir failed")
      }
    } else fs.delete(old, true) // crash after swap, before cleanup
  }

  /** Merge `rows` into the keyed parquet table at `tableDir`. */
  def upsert(rows: DataFrame, tableDir: String, keys: Seq[String]): Unit = {
    val spark = rows.sparkSession
    val dir = new Path(tableDir)
    val old = new Path(tableDir + ".old")
    val tmp = new Path(tableDir + ".tmp")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    recover(fs, dir, old, tmp)

    val merged =
      if (fs.exists(dir)) {
        val existing = spark.read.parquet(tableDir)
        existing
          .join(rows.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(rows)
      } else rows

    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new java.io.IOException(s"rename $dir -> $old failed")
    if (!fs.rename(tmp, dir))
      throw new java.io.IOException(s"rename $tmp -> $dir failed")
    fs.delete(old, true)
  }

  /** foreachBatch hook: upsert every micro-batch of full-state rows. */
  def foreachBatchUpsert(tableDir: String, keys: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch, _) => if (!batch.isEmpty) upsert(batch, tableDir, keys)
}
