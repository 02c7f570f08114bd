package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

/** Distributed exact per-group ranking for LOW-cardinality groups —
  * the missing middle between a per-key window (fine when every group
  * is small) and [[Corpus.exactPercentilesGlobal]] (no groups at all).
  *
  * The naive plan for "rank every row within its language / source /
  * shard" is `row_number() OVER (PARTITION BY grp ORDER BY …)`. With
  * a handful of corpus-scale groups that window puts EACH GROUP'S
  * ENTIRE DATA on one task — a 10-language 100 TB corpus becomes ten
  * 10 TB single-task sorts. This operator keeps the sort parallel:
  *
  *  1. range-repartition on (group, order columns) so each of
  *     `numRanges` tasks sorts only its contiguous slice;
  *  2. ONE bounded aggregate — a row per (partition, group) pair —
  *     collected and prefix-summed per group on the driver (the
  *     sanctioned-collect contract: ≤ numRanges × |groups| rows,
  *     `require`-capped, never data);
  *  3. a per-(partition, group) `row_number` window (parallel — each
  *     task sorts its slice) plus the broadcast offset table gives
  *     the exact global rank within the group.
  *
  * Rank ties: `orderCols` must be a TOTAL order within each group
  * (add a unique id as the last column) — equal full sort keys can
  * straddle a range boundary, which would make ranks of tied rows
  * partition-dependent.
  */
object GroupedRank {

  /** Adds `rankName` (1-based LONG rank within `grp` under
    * `orderCols`) to `df`. `grp` must be low-cardinality (languages,
    * sources, shards — NOT user ids): the driver offset table holds
    * one row per (range, group) pair and is capped at
    * `maxOffsetRows`. Rows where `grp` or any order column is null
    * rank with Spark's default null ordering (nulls first asc).
    *
    * The ranged input is persisted across the two passes (offset
    * count + final rank) so the expensive range exchange runs once;
    * the cache is input-lifetime and caller-released (the same
    * contract as EditSimilarity — Bench clears caches per query). */
  def rankInGroup(df: DataFrame, grp: Column, orderCols: Seq[Column],
      rankName: String = "rank", numRanges: Int = 64,
      maxOffsetRows: Int = 100000): DataFrame =
    withGroupOffsets(df, grp, orderCols, count(lit(1)), rankName,
      numRanges, maxOffsetRows, "rankInGroup") { (w, _) =>
      row_number().over(w).cast("long")
    }

  /** The weighted analog of [[rankInGroup]]: adds `sumName` = the
    * INCLUSIVE running sum of `weight` within `grp` under `orderCols`
    * — the distributed form of
    * `sum(w) OVER (PARTITION BY g ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` for few-large-groups inputs (token-budget prefixes,
    * cumulative mixture quotas). Same machinery, with per-(range,
    * group) weight SUMS as the offsets. Null weights count 0; the
    * same bounded-collect contract and cap apply. */
  def prefixSumInGroup(df: DataFrame, grp: Column, orderCols: Seq[Column],
      weight: Column, sumName: String = "running", numRanges: Int = 64,
      maxOffsetRows: Int = 100000): DataFrame = {
    val in = df.withColumn("_gr_w", coalesce(weight.cast("long"), lit(0L)))
    withGroupOffsets(in, grp, orderCols, sum(col("_gr_w")), sumName,
      numRanges, maxOffsetRows, "prefixSumInGroup") { (w, _) =>
      sum(col("_gr_w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }.drop("_gr_w")
  }

  /** Shared core: range-repartition on (group, order), collect the
    * bounded per-(range, group) `offsetAgg` table, prefix-sum it per
    * group on the driver, broadcast-join it back (null-safe on the
    * group so null groups rank instead of silently dropping), and add
    * `name` = localExpr(window, offsets) + the group's offset. */
  private def withGroupOffsets(df: DataFrame, grp: Column,
      orderCols: Seq[Column], offsetAgg: Column, name: String,
      numRanges: Int, maxOffsetRows: Int, caller: String)(
      localExpr: (org.apache.spark.sql.expressions.WindowSpec,
        DataFrame) => Column): DataFrame = {
    require(orderCols.nonEmpty, s"$caller: orderCols must be non-empty")
    require(numRanges > 0, s"$caller: numRanges must be > 0, got $numRanges")
    val spark = df.sparkSession
    val cols = df.columns
    // eager checkpoint, not persist: the offsets collect below and the
    // returned plan must read the SAME materialized partitioning
    // (spark_partition_id is physical), and a persist here would be
    // caller-unreleasable since only the final plan escapes
    val ranged = Materialize.eager(df.withColumn("_gr_g", grp)
      .repartitionByRange(numRanges, col("_gr_g") +: orderCols: _*)
      .withColumn("_gr_pid", spark_partition_id()))
    // bounded: one row per non-empty (range, group) pair
    val partials = ranged.groupBy(col("_gr_pid"), col("_gr_g"))
      .agg(offsetAgg.cast("long").as("_c")).collect()
    require(partials.length <= maxOffsetRows,
      s"$caller: offset table has ${partials.length} (range, group) " +
        s"rows, over the $maxOffsetRows cap — the group column has too " +
        "many distinct values for the bounded-collect contract; use a " +
        "per-key window for high-cardinality groups")
    // prefix sum per group in (group, partition-id) order
    val offRows = partials
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3))
          .map { case ((pid, g, _), off) => Row(pid, g, off) }
      }.toSeq
    val grpField = ranged.schema("_gr_g")
    val offSchema = StructType(Seq(
      StructField("_gr_pid", IntegerType, nullable = false),
      StructField("_gr_g", grpField.dataType, grpField.nullable),
      StructField("_gr_off", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(col("_gr_pid"), col("_gr_g"))
      .orderBy(orderCols: _*)
    ranged
      .join(broadcast(offDf
          .withColumnRenamed("_gr_pid", "_gr_pid2")
          .withColumnRenamed("_gr_g", "_gr_g2")),
        col("_gr_pid") === col("_gr_pid2") && col("_gr_g") <=> col("_gr_g2"))
      .withColumn(name, localExpr(w, offDf) + col("_gr_off"))
      .select((cols.map(col) :+ col(name)): _*)
  }
}
