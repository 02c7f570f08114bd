package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming quality gating — the ingestion-time mirror of
  * [[graft.operators.Corpus.percentileGate]]: drop each group's worst
  * slice by a quality score, at the moment records arrive.
  *
  * A streaming operator cannot rank a group it hasn't finished seeing,
  * so the gate splits into the two phases a production pipeline runs
  * anyway: [[thresholds]] LEARNS per-group score cutoffs from a batch
  * reference corpus (the value the batch gate's boundary rank carries),
  * and [[gate]] applies them to the stream as a PURE PROJECTION — the
  * cutoff table is collected once (bounded by group cardinality, the
  * x41/x58 sanctioned-collect contract) and rides the plan as a map
  * literal: no state store, no stream-side shuffle, no per-trigger
  * static-side re-execution, nothing grows with the stream.
  *
  * Semantics vs the batch gate: [[gate]] keeps rows with score
  * STRICTLY above their group's cutoff (the score at the batch
  * boundary rank ⌊f·n⌋ — the best DROPPED score). On a reference with
  * no score ties at the boundary, gating the reference itself equals
  * the batch operator row-for-row (spec-proven); with boundary ties it
  * is conservative (drops all tied rows, where the batch gate's
  * (score, id) total order keeps some). Groups absent from the
  * reference — or too small to drop anything (⌊f·n⌋ = 0) — pass
  * through ungated, the right default for a stream that may carry
  * sources the reference never saw.
  */
object StreamQualityGate {

  /** Per-group cutoffs from a batch reference: one row per group whose
    * worst `dropFraction` slice is non-empty — (groupCol, `cutoff`) =
    * the score at rank ⌊dropFraction·n⌋ under (score asc, id asc), via
    * the distributed grouped rank (no per-group single-task window). */
  def thresholds(reference: DataFrame, score: Column, grpCol: String,
      idCol: String, dropFraction: Double = 0.25): DataFrame = {
    require(dropFraction >= 0 && dropFraction < 1,
      s"StreamQualityGate.thresholds: dropFraction must be in [0, 1), " +
        s"got $dropFraction")
    val scored = reference
      .select(col(grpCol), col(idCol), score.cast("double").as("_s"))
    val ranked = graft.operators.GroupedRank.rankInGroup(scored,
      col(grpCol), Seq(col("_s").asc, col(idCol).asc), "_rn")
    val counts = ranked.groupBy(col(grpCol))
      .agg(count(lit(1)).as("_n"))
    ranked.join(broadcast(counts), Seq(grpCol))
      .filter(col("_rn") === floor(lit(dropFraction) * col("_n")))
      .select(col(grpCol), col("_s").as("cutoff"))
  }

  /** Gate a streaming DataFrame on frozen [[thresholds]]: keep rows
    * whose `score` strictly clears their group's cutoff; rows of
    * unknown groups pass. `cutoffs` is a STATIC (groupCol, cutoff)
    * relation — collected here once into a plan-literal map. Output:
    * input columns + `scoreName`. */
  def gate(docsStream: DataFrame, cutoffs: DataFrame, score: Column,
      grpCol: String, scoreName: String = "score",
      maxGroups: Int = 100000): DataFrame = {
    require(!docsStream.columns.contains(scoreName),
      s"StreamQualityGate.gate: input already carries '$scoreName' — " +
        "rename first")
    val rows = cutoffs
      .select(col(grpCol).cast("string"), col("cutoff").cast("double"))
      .collect()
    require(rows.length <= maxGroups,
      s"StreamQualityGate.gate: ${rows.length} cutoff groups exceed the " +
        s"$maxGroups cap — a cutoff table that size should broadcast-join " +
        "in foreachBatch instead of riding the plan as a literal")
    // A null cutoff means "no cutoff learned" (e.g. the boundary-rank
    // row carried a null score) — dropping it here keeps the group
    // ungated, instead of getDouble's unbox-to-0.0 silently gating it.
    val pairs = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .flatMap(r => Seq(lit(r.getString(0)), lit(r.getDouble(1))))
    val cutoffFor =
      if (pairs.isEmpty) lit(null).cast("double")
      else element_at(map(pairs.toSeq: _*), col(grpCol).cast("string"))
    docsStream
      .withColumn(scoreName, score.cast("double"))
      .filter(cutoffFor.isNull || col(scoreName) > cutoffFor)
  }
}
