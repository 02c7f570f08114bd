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
    * relation is deduplicated, capped at `maxVocab` (default 100k —
    * the honest budget for a plan-literal array; a real subword vocab
    * fits, an open token universe does not and must broadcast-join in
    * `foreachBatch` instead), and sorted by the ENGINE's string order
    * (UTF8 binary) — the merge kernel's caller contract.
    *
    * The cap is enforced BEFORE anything is collected: a bounded
    * `limit(cap + 1)` count probes the distinct-vocab cardinality, so
    * an unbounded vocabulary relation fails fast instead of
    * materializing on the driver first and OOMing past the guard. */
  def annotate(docsStream: DataFrame, vocab: DataFrame,
      textCol: String = "text", tokenCol: String = "token",
      maxVocab: Int = 100000): DataFrame = {
    require(maxVocab >= 1 && maxVocab <= 1000000,
      s"StreamOovMonitor: maxVocab must be in [1, 1e6], got $maxVocab" +
        " — a plan literal cannot honestly carry more; broadcast-join" +
        " in foreachBatch for larger vocabularies")
    require(!docsStream.columns.contains("n_tokens") &&
      !docsStream.columns.contains("n_oov"),
      "StreamOovMonitor.annotate: input already carries n_tokens/n_oov")
    val vdis = vocab
      .select(col(tokenCol).cast("string").as("t"))
      .filter(col("t").isNotNull).distinct()
    // fail-fast cardinality probe: scans at most cap+1 distinct tokens,
    // never materializes the relation on the driver
    val probed = vdis.limit(maxVocab + 1).count()
    require(probed <= maxVocab,
      s"StreamOovMonitor: vocab exceeds the $maxVocab cap " +
        "(cardinality probe hit the bound before collecting) — " +
        "broadcast-join in foreachBatch instead")
    val varr: Seq[String] = vdis.orderBy(col("t"))
      .collect().map(_.getString(0)).toSeq
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
