package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramExprs
import graft.operators.Unigram

/** Streaming unigram-LM tokenization — the ingestion-time mirror of
  * [[graft.operators.Unigram.encode]], completing the tokenizer
  * matrix ([[StreamBpeTokenize]] is the BPE half): the vocabulary is
  * TRAINED offline ([[graft.operators.Unigram.seedVocab]], optionally
  * hard-EM-refined and shipped via `saveUnigramTokenizer`), FROZEN,
  * and every arriving document segments as a PURE PROJECTION — the
  * (piece, freq) table rides the plan as two bounded literal arrays
  * for the doc-local Viterbi kernel
  * ([[graft.functions.UnigramEncodeExpr]]), applied per word inside a
  * `transform` lambda. No state store, no stream-side shuffle, no
  * stream-batch join; nothing grows with the stream.
  *
  * The vocabulary literal is bounded and VALIDATED by the
  * `collectVocab` fetch (cap-probed, duplicate/null/non-positive
  * checked) before anything is collected — a runaway or corrupt
  * vocabulary relation fails loudly at query construction.
  */
object StreamUnigramTokenize {

  /** Add `pieces` (array&lt;string&gt;) and `n_tokens` columns to a
    * (possibly streaming) document frame; with `asIds = true`, add
    * `ids` (array&lt;int&gt;, the 1-based sorted-vocab id contract)
    * instead of `pieces`. Null text yields a null array and
    * n_tokens 0. Batch-equivalence: over a closed corpus the
    * annotated stream equals [[graft.operators.Unigram.encode]] /
    * [[graft.operators.Unigram.encodeIds]] row for row
    * (StreamUnigramTokenizeSpec). */
  def annotate(docsStream: DataFrame, vocab: DataFrame,
      textCol: String = "text", maxPieces: Int = 100000,
      asIds: Boolean = false): DataFrame = {
    require(maxPieces >= 1 && maxPieces <= 1000000,
      s"StreamUnigramTokenize: maxPieces must be in [1, 1e6], got $maxPieces")
    val outCol = if (asIds) "ids" else "pieces"
    require(!docsStream.columns.contains(outCol) &&
      !docsStream.columns.contains("n_tokens"),
      s"StreamUnigramTokenize.annotate: input already carries " +
        s"$outCol/n_tokens")
    val (ps, fs) = Unigram.collectVocab(vocab, maxPieces)
    val pl = typedlit(ps)
    val fl = typedlit(fs)
    val words = array_remove(split(col(textCol), "\\s+"), "")
    val enc =
      if (asIds)
        flatten(transform(words, w => UnigramExprs.encodeIds(w, pl, fl)))
      else
        flatten(transform(words, w => UnigramExprs.encode(w, pl, fl)))
    docsStream
      .withColumn(outCol, enc)
      .withColumn("n_tokens",
        coalesce(size(col(outCol)).cast("long"), lit(0L)))
  }
}
