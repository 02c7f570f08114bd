package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{KeywordExprs, TextAnalysis}

/** Streaming ingestion screen: PII redaction + keyword blocklist
  * tagging — the scrub-and-flag stage every public-web ingestion
  * pipeline runs BEFORE anything else touches (or persists) the raw
  * text. Both passes are PURE PROJECTIONS (the regex chain and the
  * Aho–Corasick automaton ride the plan as literals): no state store,
  * no stream-side shuffle, nothing grows with the stream — the
  * [[StreamWordpieceTokenize]] discipline applied to the screening
  * stage.
  *
  * Column contract: `textCol` is REPLACED by its redacted form (the
  * point of a scrub is that the raw text does not continue
  * downstream; keyword counting runs on the redacted text for the
  * same reason), plus `kw_hits` (total overlapping keyword
  * occurrences, `bigint`), `kw_kinds` (distinct keywords present,
  * `int`). Batch-equivalence: over a closed corpus the annotated
  * stream equals the same projection applied in batch, row for row,
  * at any batch split (StreamScreenSpec).
  */
object StreamScreen {

  /** Annotate a (possibly streaming) document frame; see the column
    * contract above. `keywords` must be non-empty, distinct,
    * non-empty strings within the automaton byte budget — validated
    * at query construction ([[KeywordExprs.keywordCounts]]). */
  def annotate(docsStream: DataFrame, keywords: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(docsStream.columns.contains(textCol),
      s"StreamScreen.annotate: no '$textCol' column")
    require(!docsStream.columns.contains("kw_hits") &&
      !docsStream.columns.contains("kw_kinds"),
      "StreamScreen.annotate: input already carries kw_hits/kw_kinds")
    val redacted = TextAnalysis.scrubPii(col(textCol))
    // count on col(textCol) AFTER the replacing withColumn — not on the
    // `redacted` expression — so the scrub regex chain runs once per row,
    // not twice (the automaton then reads the already-redacted column)
    val counts: Column = KeywordExprs.keywordCounts(col(textCol), keywords)
    docsStream
      .withColumn(textCol, redacted)
      .withColumn("_kc", counts)
      .withColumn("kw_hits",
        coalesce(aggregate(col("_kc"), lit(0L), (a, c) => a + c), lit(0L)))
      .withColumn("kw_kinds",
        coalesce(size(filter(col("_kc"), c => c > lit(0L))), lit(0)))
      .drop("_kc")
  }
}
