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
