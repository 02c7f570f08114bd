package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between corpus preparation and
  * tokenized training batches: documents are laid out into fixed
  * token-budget training sequences. Two packing disciplines, matching
  * the two ways production pipelines actually pack:
  *
  *  - [[packConcat]]: concatenate-and-slice (pretraining style). All
  *    documents in a shard are conceptually concatenated in id order
  *    and cut every `budget` tokens; a document may span sequences.
  *    Pure window arithmetic — cumulative offsets then a generator
  *    projection — so it is a single keyed exchange and fully
  *    SQL-expressible.
  *  - [[packGreedy]]: first-fit no-split (SFT style). Documents are
  *    placed in id order; when the next document no longer fits the
  *    current sequence a new one starts, and documents never split.
  *    The boundary depends on every previous placement (a capped
  *    running fill, NOT `floor(cumsum/budget)`), which no fixed-frame
  *    window expresses — so the scan runs as a sorted-group stream
  *    (`flatMapSortedGroups`): one shuffle on the shard key, O(1)
  *    state per shard, the same execution contract as sessionization.
  *
  * Both are deterministic given (shard, id order, token counts): a
  * re-run yields byte-identical packing, and the shard column is the
  * parallelism knob — each shard packs independently, so scale-out is
  * "more shards", never "a bigger sequential scan". When the natural
  * shard column is coarse (5 sources over a 100 TB corpus = 5 tasks),
  * `subShards > 1` derives finer units: documents hash-split into
  * (shard, [[Corpus.hashUnit]](id)·n) groups that pack independently,
  * and `seq_idx` stays dense per shard via deterministic per-sub-shard
  * offsets (cumulative sequence counts in sub-shard order — a
  * #shards×n-row broadcast). The resulting packing differs from the
  * single-scan one (placement order is per sub-shard) but satisfies
  * the same contract: every document placed exactly once, no sequence
  * over budget except a lone oversize document, byte-identical on
  * re-run. Documents longer than the budget: [[packGreedy]] isolates
  * them in their own (overflowing) sequence — compose with
  * [[Corpus.chunk]] upstream when hard budget caps are required;
  * [[packConcat]] splits them across as many sequences as they need.
  */
object Packing {

  /** Deterministic sub-shard index in [0, n): [[Corpus.hashUnit]] is
    * strictly < 1, so the floor never reaches n. */
  private def subIdx(key: Column, n: Int): Column =
    floor(Corpus.hashUnit(key) * lit(n)).cast("int")

  /** Re-base per-sub-shard `seq_idx` to dense per-shard indices: offset
    * each sub-shard by the total sequence count of the sub-shards before
    * it (sub-shard order). The offset table is #shards × subShards rows
    * — broadcast — but computing it re-evaluates the packed relation, so
    * sub-shard mode costs two passes over the shuffled data. */
  private def offsetSubShards(packed: DataFrame): DataFrame = {
    val counts = packed.groupBy(col("shard"), col("_sub"))
      .agg((max(col("seq_idx")) + 1L).as("_cnt"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .select(col("shard"), col("_sub"), col("_off"))
    packed.join(broadcast(offsets), Seq("shard", "_sub"))
      .select(col("shard"), col("doc_id"),
        (col("seq_idx") + col("_off")).as("seq_idx"),
        col("tok_offset"), col("n_tokens"))
  }

  /** First-fit no-split packing of `df` rows into sequences of at most
    * `budget` tokens, walking each shard's documents in ascending
    * `idCol` order. Output: `shard` (string form of `shardCol`),
    * `doc_id`, `seq_idx` (0-based per shard), `tok_offset` (token
    * offset of this document inside its sequence), `n_tokens`.
    *
    * A new sequence starts exactly when `fill + n_tokens > budget`
    * for a non-first document (zero-token documents stack at the
    * current offset; an oversize document gets its own sequence and
    * forces the next document onto a fresh one). Rows with a null id
    * are dropped (no deterministic position); null token counts pack
    * as 0. `idCol` must be integral — ordering happens on the numeric
    * value, so packing order matches `ORDER BY idCol`.
    *
    * `subShards > 1` packs (shard, hash-sub-shard) groups independently
    * (n× the parallelism) and re-bases `seq_idx` densely per shard —
    * see the object doc for the contract. */
  def packGreedy(df: DataFrame, shardCol: Column, idCol: String,
      tokensCol: Column, budget: Long, subShards: Int = 1): DataFrame = {
    require(budget > 0, s"packGreedy: budget must be > 0, got $budget")
    require(subShards >= 1, s"packGreedy: subShards must be >= 1, got $subShards")
    val spark = df.sparkSession
    import spark.implicits._
    val subCol = if (subShards == 1) lit(0) else subIdx(col(idCol), subShards)
    val packed = df.filter(col(idCol).isNotNull)
      .select(shardCol.cast("string").as("_1"), subCol.as("_2"),
        col(idCol).cast("long").as("_3"),
        coalesce(tokensCol.cast("long"), lit(0L)).as("_4"))
      .as[(String, Int, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapSortedGroups($"_3") { (key, docs) =>
        // streaming scan: Iterator.map keeps O(1) state per group
        var seq = -1L
        var fill = 0L
        docs.map { case (_, _, id, toks) =>
          if (seq < 0 || fill + toks > budget) { seq += 1; fill = 0L }
          val off = fill
          fill += toks
          (key._1, key._2, id, seq, off, toks)
        }
      }
      .toDF("shard", "_sub", "doc_id", "seq_idx", "tok_offset", "n_tokens")
    if (subShards == 1)
      packed.select(col("shard"), col("doc_id"), col("seq_idx"),
        col("tok_offset"), col("n_tokens"))
    else offsetSubShards(packed)
  }

  /** Concatenate-and-slice packing: within a shard, documents are laid
    * end-to-end in ascending `idCol` order and the token stream is cut
    * every `budget` tokens. One output row per (document, sequence it
    * touches): `shard`, `doc_id`, `seq_idx`, `tok_offset` (where the
    * document's slice starts inside that sequence), `n_tokens` (slice
    * length; slices of one document sum to its token count). Zero-token
    * documents land in the sequence at their concat position with an
    * empty slice.
    *
    * Plan: a per-shard cumulative-sum window (one keyed exchange, a
    * shard's timeline sorts in one spilling sort) then a generator
    * projection over the spanned sequence range — output rows ∝
    * slices, never shard². Exact for per-shard token totals below 2⁵³
    * (the slice arithmetic runs through double-exact longs); shards
    * exist precisely to bound that. Same null semantics and `subShards`
    * contract as [[packGreedy]] (each hash-sub-shard concatenates its
    * own documents; a shard can then end with up to `subShards`
    * underfull tail sequences instead of one). */
  def packConcat(df: DataFrame, shardCol: Column, idCol: String,
      tokensCol: Column, budget: Long, subShards: Int = 1): DataFrame = {
    require(budget > 0, s"packConcat: budget must be > 0, got $budget")
    require(subShards >= 1, s"packConcat: subShards must be >= 1, got $subShards")
    val w = Window.partitionBy(col("shard"), col("_sub")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = lit(budget)
    val subCol = if (subShards == 1) lit(0) else subIdx(col(idCol), subShards)
    val packed = df.filter(col(idCol).isNotNull)
      .select(shardCol.cast("string").as("shard"), subCol.as("_sub"),
        col(idCol).cast("long").as("doc_id"),
        coalesce(tokensCol.cast("long"), lit(0L)).as("toks"))
      .withColumn("start", coalesce(sum(col("toks")).over(w), lit(0L)))
      // spanned sequences: floor(start/B) .. floor((start+toks-1)/B);
      // greatest(toks,1) pins empty docs to the single seq at `start`
      .select(col("shard"), col("_sub"), col("doc_id"), col("toks"),
        col("start"),
        explode(sequence(
          floor(col("start") / b).cast("long"),
          floor((col("start") + greatest(col("toks"), lit(1L)) - 1) / b)
            .cast("long"))).as("seq_idx"))
      .select(col("shard"), col("_sub"), col("doc_id"), col("seq_idx"),
        (greatest(col("start"), col("seq_idx") * b) - col("seq_idx") * b)
          .as("tok_offset"),
        (least((col("seq_idx") + 1) * b, col("start") + col("toks"))
          - greatest(col("start"), col("seq_idx") * b)).as("n_tokens"))
    if (subShards == 1)
      packed.select(col("shard"), col("doc_id"), col("seq_idx"),
        col("tok_offset"), col("n_tokens"))
    else offsetSubShards(packed)
  }

  /** Pack the corpus's TOKEN STREAM into fixed-length training
    * sequences across document boundaries — the materialized
    * pretraining artifact itself (every sequence exactly `seqTokens`
    * tokens except the final remainder), where [[packConcat]] plans
    * slice boundaries by token COUNTS without materializing tokens.
    *
    * Scale shape: the token stream is ranked GLOBALLY in (doc, idx)
    * order by [[GroupedRank.rankInGroup]] with a constant group — the
    * range-partition + bounded-offset-table route, so the global order
    * costs one range exchange of (id, idx, token) rows and NO
    * single-task window anywhere (machine-checked by the partition-less
    * WindowExec guard). The final seq_id aggregate shuffles the token
    * stream once more — inherent: the OUTPUT is the full token stream
    * regrouped; per-sequence assembly sorts ≤ `seqTokens` elements
    * doc-locally. Deterministic: order is a pure function of
    * (doc id, position), so re-runs and resumes pack identically.
    *
    * Output: `seq_id` (0-based), `n_tokens`, `tokens`
    * (`delimOut`-joined). */
  def packTokensGlobal(docs: DataFrame, seqTokens: Int = 256,
      idCol: String = "doc_id", textCol: String = "text",
      delimOut: String = "\u0001"): DataFrame = {
    require(seqTokens >= 1,
      s"packTokensGlobal: seqTokens must be >= 1, got $seqTokens")
    val tok = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        posexplode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
          .as(Seq("_idx", "_tok")))
    val ranked = GroupedRank.rankInGroup(tok, lit(1),
      Seq(col("_id").asc, col("_idx").asc), "_pos")
    ranked
      .withColumn("seq_id", ((col("_pos") - 1) / seqTokens).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          x => x.getField("_tok")), delimOut).as("tokens"))
  }
}
