package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive scan fan-out for CPU-dense kernel passes (guide §2.5,
  * "input skew: one huge unsplittable file … repartition immediately
  * after the read").
  *
  * The harness fixtures are single-file / single-row-group parquet, so
  * a file scan yields ONE task no matter the split config (parquet
  * splits only at row-group boundaries) and every doc-local kernel
  * (q-grams, tokenizer encode, winnowing, signatures) runs on 1 of N
  * cores until the first exchange. Round-robin repartitioning the
  * pruned scan output to `defaultParallelism` spreads the kernel at the
  * cost of shuffling the (already column-pruned) rows once — measured
  * on x70 at sf0.1: the 2.5 s single-task gram+prefix stage becomes a
  * 0.1 s shuffle plus a ~0.2 s 32-way stage (OPTIMIZATION_r16.md).
  *
  * SCALE SHAPE: the fan-out fires only when the physical scan yields
  * fewer partitions than cores. Production corpus scans split into
  * thousands of tasks, so the condition is false and the plan is
  * byte-identical to the un-wrapped one — no extra exchange at 100 TB.
  * The check reads partition counts from the planned scan (file split
  * arithmetic, no job runs).
  *
  * Correctness: round-robin repartition permutes rows across
  * partitions only; every consumer here is declarative (the driver
  * already validates all queries at BOTH 8 and 32 cores, i.e. under
  * different partitionings). Spark's sort-before-repartition default
  * keeps the row→partition map deterministic under task retries.
  */
object Parallelism {

  /** `df` repartitioned to the session's core count when its physical
    * plan would execute in fewer partitions; `df` unchanged otherwise.
    * Call on the COLUMN-PRUNED input right before a CPU-heavy kernel,
    * never on a raw table (it would block predicate pushdown for
    * filters applied above it). */
  def fanOutScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch plans manage their own width
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => target }
    if (parts > 0 && parts < target) df.repartition(target) else df
  }
}
