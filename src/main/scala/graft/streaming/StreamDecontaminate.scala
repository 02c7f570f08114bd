package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SetExprs, ShingleExprs}

/** Streaming decontamination — the ingestion-time mirror of
  * [[graft.operators.Dedup.decontaminate]]: tag every incoming document
  * with its shared-gram count against a STATIC benchmark set, so
  * contaminated crawl records are flagged (or dropped) the moment they
  * arrive instead of in a nightly batch pass.
  *
  * Shape: the benchmark collapses ONCE, at stream-construction time,
  * into a single sorted hashed-gram array that rides the plan as a
  * LITERAL — so each micro-batch is a pure doc-local projection (the
  * x20 sorted-merge overlap kernel): no state store, no stream-side
  * shuffle, no static-side re-execution per batch (a stream–static join
  * re-runs the static plan every trigger), and nothing grows over the
  * stream's lifetime. The one driver materialization is bounded by
  * `maxBroadcastGrams` exactly like the batch broadcast route (~8 bytes
  * per gram); a benchmark past the cap is a misuse of the streaming
  * route — the guard says to run [[graft.operators.Dedup
  * .decontaminateBloom]] inside `foreachBatch` instead.
  *
  * Stream ≡ batch: for any prefix of micro-batches, the emitted
  * (id, n_shared, contaminated) rows equal the batch operator on the
  * same closed input (spec-proven) — the benchmark is static, so
  * per-document results are independent of batching.
  */
object StreamDecontaminate {

  /** Flag contaminated documents on a streaming DataFrame.
    *
    * @param docsStream streaming docs (textCol, ...); all input columns
    *   pass through
    * @param benchmark STATIC benchmark docs (textCol, ...)
    * @return input columns + `n_shared` + `contaminated`
    */
  def flag(docsStream: DataFrame, benchmark: DataFrame,
      minSharedGrams: Int = 8, n: Int = 5, textCol: String = "text",
      maxBroadcastGrams: Long = 4L * 1000 * 1000): DataFrame = {
    require(minSharedGrams > 0,
      s"StreamDecontaminate: minSharedGrams must be > 0, got $minSharedGrams")
    require(maxBroadcastGrams > 0,
      s"StreamDecontaminate: maxBroadcastGrams must be > 0, got " +
        s"$maxBroadcastGrams")
    val conflict = docsStream.columns
      .intersect(Seq("n_shared", "contaminated"))
    require(conflict.isEmpty,
      s"StreamDecontaminate: input already carries ${conflict.mkString(",")}" +
        " (output column names) — rename first")
    // one batch job at stream-construction time: distinct grams, capped,
    // collected sorted (the sanctioned bounded collect — same cap, same
    // ~8 B/gram bound as the batch route's single-row broadcast)
    val bg = benchmark
      .select(explode(ShingleExprs.shingleSetChars(col(textCol), n))
        .as("_g"))
      .distinct()
    val nBench = bg.count()
    require(nBench <= maxBroadcastGrams,
      s"StreamDecontaminate: benchmark has $nBench distinct grams > cap " +
        s"$maxBroadcastGrams — too large for the literal-array route; run " +
        "Dedup.decontaminateBloom inside foreachBatch instead")
    val grams: Array[Long] = bg
      .orderBy(col("_g")).collect().map(_.getLong(0))
    docsStream
      .withColumn("n_shared",
        coalesce(SetExprs.sortedIntersectSize(
          ShingleExprs.shingleSetChars(col(textCol), n),
          typedLit(grams)), lit(0)).cast("long"))
      .withColumn("contaminated", col("n_shared") >= minSharedGrams)
  }

  /** [[flag]] then DROP contaminated documents — the filter mode for
    * pipelines that quarantine instead of annotate. */
  def clean(docsStream: DataFrame, benchmark: DataFrame,
      minSharedGrams: Int = 8, n: Int = 5, textCol: String = "text",
      maxBroadcastGrams: Long = 4L * 1000 * 1000): DataFrame =
    flag(docsStream, benchmark, minSharedGrams, n, textCol,
      maxBroadcastGrams)
      .filter(!col("contaminated"))
      .drop("n_shared", "contaminated")
}
