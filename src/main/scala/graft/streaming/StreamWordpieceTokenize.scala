package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramExprs
import graft.operators.Unigram

/** Streaming WordPiece tokenization — the ingestion-time mirror of
  * [[graft.operators.Unigram.wordpieceEncode]], completing the
  * tokenizer matrix's third row ([[StreamBpeTokenize]] = BPE,
  * [[StreamUnigramTokenize]] = unigram Viterbi): the vocabulary is
  * TRAINED offline and shipped via `saveUnigramTokenizer` (one
  * artifact format for the whole trio), FROZEN, and every arriving
  * document segments greedy-longest-match-first as a PURE PROJECTION —
  * the (piece, freq) table rides the plan as two bounded literal
  * arrays for the doc-local max-munch kernel
  * ([[graft.functions.UnigramEncodeExpr]] with `greedy = true`),
  * applied per word inside a `transform` lambda. No state store, no
  * stream-side shuffle, no stream-batch join; nothing grows with the
  * stream.
  *
  * The vocabulary literal is bounded and VALIDATED by the
  * `collectVocab` fetch (cap-probed, duplicate/null/non-positive
  * checked) before anything is collected — a runaway or corrupt
  * vocabulary relation fails loudly at query construction.
  */
object StreamWordpieceTokenize {

  /** Add `pieces` (array&lt;string&gt;) and `n_tokens` columns to a
    * (possibly streaming) document frame; with `asIds = true`, add
    * `ids` (array&lt;int&gt;, the 1-based sorted-vocab id contract,
    * 0 = UNK single char) instead of `pieces`. Null text yields a
    * null array and n_tokens 0. Batch-equivalence: over a closed
    * corpus the annotated stream equals
    * [[graft.operators.Unigram.wordpieceEncode]] /
    * [[graft.operators.Unigram.wordpieceEncodeIds]] row for row
    * (StreamWordpieceTokenizeSpec). */
  /** With `bert = true` the max-munch rule is the full BERT one
    * ([[graft.functions.UnigramOps.maxMunchBert]]): `##` continuation
    * lookups against a [[graft.operators.Unigram.wordpieceVocab]]
    * tagged vocabulary, whole-word `[UNK]` (id 0) on a stalled walk —
    * still a pure projection. */
  def annotate(docsStream: DataFrame, vocab: DataFrame,
      textCol: String = "text", maxPieces: Int = 100000,
      asIds: Boolean = false, bert: Boolean = false): DataFrame = {
    require(maxPieces >= 1 && maxPieces <= 1000000,
      s"StreamWordpieceTokenize: maxPieces must be in [1, 1e6], " +
        s"got $maxPieces")
    val outCol = if (asIds) "ids" else "pieces"
    require(!docsStream.columns.contains(outCol) &&
      !docsStream.columns.contains("n_tokens"),
      s"StreamWordpieceTokenize.annotate: input already carries " +
        s"$outCol/n_tokens")
    val (ps, fs) = Unigram.collectVocab(vocab, maxPieces)
    val pl = typedlit(ps)
    val fl = typedlit(fs)
    val words = array_remove(split(col(textCol), "\\s+"), "")
    val enc = (asIds, bert) match {
      case (false, false) =>
        flatten(transform(words, w => UnigramExprs.wordpiece(w, pl, fl)))
      case (true, false) =>
        flatten(transform(words, w => UnigramExprs.wordpieceIds(w, pl, fl)))
      case (false, true) =>
        flatten(transform(words, w => UnigramExprs.wordpieceBert(w, pl, fl)))
      case (true, true) =>
        flatten(transform(words,
          w => UnigramExprs.wordpieceBertIds(w, pl, fl)))
    }
    docsStream
      .withColumn(outCol, enc)
      .withColumn("n_tokens",
        coalesce(size(col(outCol)).cast("long"), lit(0L)))
  }
}
