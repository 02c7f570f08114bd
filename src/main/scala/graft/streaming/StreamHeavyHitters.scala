package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MisraGriesTokens, TextAnalysis}

/** Streaming heavy-hitter candidates — the ingestion-time companion of
  * [[graft.operators.Vocab.heavyHitters]].
  *
  * The batch operator is two passes: a Misra–Gries candidate summary,
  * then an exact recount of the (bounded) candidate set. A stream can
  * run the FIRST pass online — the MG aggregate is mergeable, so
  * Structured Streaming folds every micro-batch into one
  * capacity-bounded state row — but not the second: recounting
  * exactly would mean replaying the whole history each trigger. So
  * this operator maintains the live candidate summary + running token
  * total (the production pattern: a cheap always-current trending
  * signal; the exact φ-heavy confirmation runs as the batch operator
  * over the archived feed, e.g. [[RawArchive]]'s output).
  *
  * MG's guarantee survives incremental merging in any batch order:
  * every token with true frequency > n/capacity is IN the summary
  * (the set may also hold false positives — that is what the batch
  * confirm pass is for; counts are lower bounds, each short by at
  * most n/capacity).
  *
  * State: ONE row of ≤ capacity (token, count) pairs — independent of
  * stream length. Output mode must be Complete (the summary row is
  * replaced each trigger).
  *
  * Output per trigger: (token, count_lb, n_tokens) — the candidate
  * set exploded, with the running total alongside. */
object StreamHeavyHitters {

  def candidates(lines: DataFrame, textCol: Column,
      capacity: Int): DataFrame = {
    require(capacity >= 2,
      s"StreamHeavyHitters: capacity must be >= 2, got $capacity")
    lines
      .agg(MisraGriesTokens.summary(textCol, capacity).as("_cands"),
        sum(TextAnalysis.tokenCount(textCol)).cast("long").as("n_tokens"))
      .select(explode(col("_cands")).as("_c"), col("n_tokens"))
      .select(col("_c.token").as("token"),
        col("_c.est").as("count_lb"), col("n_tokens"))
  }
}
