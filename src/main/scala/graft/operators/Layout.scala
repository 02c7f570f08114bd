package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExprs

/** Physical-layout operators — how rows land in files decides how much
  * of 100 TB a filtered scan has to read. */
object Layout {

  /** Z-order clustering: compute the Morton z-value of two long keys
    * and range-partition + sort the data by it, so a subsequent write
    * produces files whose min/max stats are narrow in BOTH keys —
    * multi-column data skipping from one sort key.
    *
    * Scale shape: one range exchange (sampled bounds, same machinery as
    * any global sort) + in-partition sort; `numFiles` is the target
    * file count. The z column is kept (callers drop it after write, or
    * keep it as the clustering key for downstream merge joins). */
  /** Partitioned columnar write — the batch analog of the raw-archive
    * streaming sink (day-partitioned snappy, SURVEY §2.7) for any
    * partition scheme: `partitionBy` directories give readers partition
    * PRUNING (a dt/source predicate never opens non-matching files),
    * and the format/compression knobs cover the parquet/orc surface the
    * environment ships. Text-era append hacks are obsolete: columnar
    * writers are transactional per job, and re-running with
    * `overwrite = true` + dynamic partition overwrite replaces exactly
    * the partitions present in `df` (replay-idempotent), never the
    * whole table. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], format: String = "parquet",
      compression: String = "snappy", overwrite: Boolean = true): Unit = {
    require(Set("parquet", "orc").contains(format),
      s"writePartitioned: format must be parquet or orc, got '$format'")
    require(partitionCols.nonEmpty,
      "writePartitioned: partitionCols must be non-empty (use a plain " +
        "write for unpartitioned tables)")
    // per-writer option (not a session conf mutation): overrides
    // spark.sql.sources.partitionOverwriteMode for THIS write only, so
    // concurrent jobs on the same SparkSession never observe dynamic
    // overwrite and two concurrent writePartitioned calls cannot race a
    // save/restore of shared state
    df.write
      .mode(if (overwrite) "overwrite" else "append")
      .format(format)
      .option("compression", compression)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .save(path)
  }

  def zorderBy(df: DataFrame, a: Column, b: Column,
      numFiles: Int = 32, zCol: String = "z"): DataFrame = {
    require(numFiles >= 1, s"zorderBy: numFiles must be >= 1, got $numFiles")
    require(!df.columns.contains(zCol),
      s"zorderBy: column '$zCol' already exists")
    df.withColumn(zCol, ZOrderExprs.zorder(a.cast("long"), b.cast("long")))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
  }

}
