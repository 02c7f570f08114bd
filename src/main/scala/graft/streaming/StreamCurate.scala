package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** The composed streaming ingestion pipeline — the online mirror of the
  * batch curation pipeline (x53): exact dedup → decontamination →
  * quality gate, fused into ONE streaming query.
  *
  * Each stage keeps its own scale contract ([[StreamDedup]] state-store
  * hash keys; [[StreamDecontaminate]]/[[StreamQualityGate]] plan-literal
  * side data), and because the last two are pure projections Catalyst
  * fuses them with the parse/select stages into a single codegen stage
  * after the dedup exchange — composing the pipeline adds NO extra
  * shuffles or state over running dedup alone.
  *
  * Stage order is the cheap-to-expensive discipline of the batch
  * pipeline: dedup first (a duplicate pays one 16-byte hash, never a
  * gram scan), then the contamination drop, then scoring. Output: input
  * columns + the quality score column of surviving documents.
  */
object StreamCurate {

  /** @param docsStream streaming documents (idCol, textCol, grpCol, ...)
    * @param benchmark STATIC benchmark corpus for decontamination
    * @param cutoffs STATIC per-group score cutoffs
    *   ([[StreamQualityGate.thresholds]] output)
    * @param score quality score expression over the stream's columns */
  def curate(docsStream: DataFrame, benchmark: DataFrame,
      cutoffs: DataFrame, score: Column, grpCol: String,
      minSharedGrams: Int = 8, n: Int = 5, textCol: String = "text",
      scoreName: String = "score"): DataFrame = {
    val deduped = StreamDedup.dedupForever(docsStream, textCol)
    val clean = StreamDecontaminate.clean(deduped, benchmark,
      minSharedGrams, n, textCol)
    StreamQualityGate.gate(clean, cutoffs, score, grpCol, scoreName)
  }
}
