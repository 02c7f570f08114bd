package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeExprs
import graft.operators.Vocab

/** Streaming subword tokenization — the ingestion-time mirror of
  * [[graft.operators.Vocab.bpeEncodeChar]], the way a training
  * pipeline actually tokenizes: the vocabulary is TRAINED offline
  * (batch [[graft.operators.Vocab.bpeMergesChar]]), FROZEN, and every
  * arriving document is encoded as a PURE PROJECTION (the
  * [[StreamOovMonitor]] contract) — the rank-ordered merge table rides
  * the plan as two literal arrays for the doc-local
  * [[graft.functions.BpeEncodeExpr]] kernel, applied per word inside a
  * `transform` lambda. No state store, no stream-side shuffle, no
  * stream-batch join; nothing grows with the stream.
  *
  * The merge-table literal is bounded by the trainer's nMerges ≤
  * 10,000 contract and guarded by a fail-fast cardinality probe
  * BEFORE anything is collected (the [[StreamOovMonitor.annotate]]
  * discipline) — a runaway merge relation fails loudly instead of
  * materializing on the driver.
  */
object StreamBpeTokenize {

  /** Add `bpe` (array&lt;string&gt; subword tokens) and `n_tokens`
    * columns to a (possibly streaming) document frame. Null text
    * yields a null `bpe` and n_tokens 0. Batch-equivalence:
    * over a closed corpus, the annotated stream equals
    * [[graft.operators.Vocab.bpeEncodeChar]] (or, with
    * `byteLevel = true`, [[graft.operators.Vocab.bpeEncodeByte]])
    * row for row (StreamBpeTokenizeSpec). */
  def annotate(docsStream: DataFrame, merges: DataFrame,
      textCol: String = "text", eow: String = "</w>",
      maxMerges: Int = 10000, byteLevel: Boolean = false): DataFrame = {
    require(eow.nonEmpty, "StreamBpeTokenize: eow marker must be non-empty")
    require(maxMerges >= 1 && maxMerges <= 100000,
      s"StreamBpeTokenize: maxMerges must be in [1, 1e5], got $maxMerges")
    require(!docsStream.columns.contains("bpe") &&
      !docsStream.columns.contains("n_tokens"),
      "StreamBpeTokenize.annotate: input already carries bpe/n_tokens")
    val (ls0, rs0) = Vocab.collectMergeTable(merges, maxMerges)
    val ls = typedlit(ls0)
    val rs = typedlit(rs0)
    val words = array_remove(split(col(textCol), "\\s+"), "")
    // byteLevel swaps the symbol init (UTF-8 hex pairs, the x120
    // byte-fallback alphabet) — the kernel and everything else is
    // symbol-agnostic, exactly as in the batch trainer
    val init: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (byteLevel) Vocab.byteInit(_, eow) else Vocab.charInit(_, eow)
    val bpe = flatten(transform(words, w =>
      BpeExprs.encode(init(w), ls, rs, "")))
    docsStream
      .withColumn("bpe", bpe)
      .withColumn("n_tokens",
        coalesce(size(col("bpe")).cast("long"), lit(0L)))
  }
}
