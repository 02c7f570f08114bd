package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SetExprs

/** Streaming OOV (out-of-vocabulary) monitoring — the ingestion-time
  * mirror of [[graft.operators.Vocab.oovRate]]: annotate each arriving
  * document with its token count and OOV count against a FROZEN batch
  * vocabulary, as a PURE PROJECTION (the [[StreamDecontaminate]]
  * contract): the vocabulary is collected once (bounded, loud cap) and
  * rides the plan as a sorted literal array for the doc-local
  * [[graft.functions.SortedContainsCount]] merge kernel — no state
  * store, no stream-side shuffle, nothing grows with the stream.
  *
  * Production use: the tokenizer-drift alarm. A source whose OOV rate
  * jumps between triggers is sending content the trained vocabulary
  * has never seen (new language, new template, encoding breakage) —
  * caught per micro-batch instead of at the next vocab retrain.
  */
object StreamOovMonitor {

  /** Add `n_tokens` / `n_oov` columns to a (possibly streaming)
    * document frame. Null text annotates as (0, 0). The vocabulary
    * relation is deduplicated, capped at `maxVocab` (a vocab past the
    * cap should broadcast-join in `foreachBatch` instead of riding the
    * plan as a literal), and sorted by the ENGINE's string order
    * (UTF8 binary) — the merge kernel's caller contract. */
  def annotate(docsStream: DataFrame, vocab: DataFrame,
      textCol: String = "text", tokenCol: String = "token",
      maxVocab: Long = 4000000L): DataFrame = {
    require(!docsStream.columns.contains("n_tokens") &&
      !docsStream.columns.contains("n_oov"),
      "StreamOovMonitor.annotate: input already carries n_tokens/n_oov")
    val varr: Seq[String] = vocab
      .select(col(tokenCol).cast("string").as("t"))
      .filter(col("t").isNotNull).distinct().orderBy(col("t"))
      .collect().map(_.getString(0)).toSeq
    require(varr.length <= maxVocab,
      s"StreamOovMonitor: ${varr.length} vocab tokens exceed the " +
        s"$maxVocab cap — broadcast-join in foreachBatch instead")
    val tk = sort_array(array_remove(split(col(textCol), "\\s+"), ""))
    docsStream
      .withColumn("n_tokens",
        coalesce(size(tk).cast("long"), lit(0L)))
      .withColumn("n_oov",
        col("n_tokens") -
          coalesce(SetExprs.sortedContainsCount(tk, typedlit(varr))
            .cast("long"), lit(0L)))
  }

  /** Grouped rate rollup over an [[annotate]]d frame — in streaming,
    * run inside `foreachBatch` (per-trigger rates) or under a window
    * aggregate; groups with zero tokens are absent (no rate defined),
    * matching the batch operator. */
  def rates(annotated: DataFrame, grpCol: String = "source"): DataFrame =
    annotated.groupBy(col(grpCol).as("source"))
      .agg(sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_oov")).as("n_oov"))
      .filter(col("n_tokens") > 0)
      .select(col("source"), col("n_oov"), col("n_tokens"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
}
