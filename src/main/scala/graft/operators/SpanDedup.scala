package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-level exact-substring deduplication with SPAN REMOVAL: find
  * every duplicated run of >= `windowTokens` consecutive tokens anywhere
  * in the corpus, keep the first occurrence, and REWRITE every other
  * document with the duplicated tokens excised — the Lee-et-al-style
  * "exact substring dedup at ~50-token granularity" a production
  * training-corpus pipeline runs, not just a span report.
  *
  * Algorithm (public literature): Lee et al., "Deduplicating Training
  * Data Makes Language Models Better" (ACL 2022) — their ExactSubstr
  * pass removes duplicated 50-token substrings corpus-wide. The
  * suffix-array machinery of the paper is a single-node construct; the
  * distributed restatement is window fingerprinting: every length-L
  * token window is keyed by a 64-bit hash, equal windows collide on the
  * key, and "duplicated run of length >= L" is exactly "some length-L
  * window occurs twice" (a run of R >= L duplicated tokens produces
  * R-L+1 duplicated windows whose union recovers the full run).
  *
  * Plan shape / 100 TB scale:
  *  - Window fingerprints are computed DOC-LOCALLY (one projection:
  *    token hashes, then xxhash64 over each length-L slice) and only the
  *    (fp, doc_id, pos) triple — 20 bytes — is exploded and shuffled.
  *    Text never enters the candidate exchange.
  *  - Duplicate detection: the canonical (first in (doc_id, pos) order)
  *    occurrence per fingerprint is a `min(struct(doc_id, pos))` HASH
  *    AGGREGATE — map-side partial combine collapses hot fingerprints
  *    (license headers, boilerplate repeated millions of times) to one
  *    row per map task BEFORE the exchange, so no task ever materializes
  *    a hot fingerprint's full occurrence list (a rank window keyed on
  *    fp would). Non-canonical occurrences fall out of one fp-equality
  *    join against the duplicated-fp subset; skewed fp partitions are
  *    split by AQE's skew-join handling, which cannot rescue a window.
  *  - Removal intervals aggregate per doc (bounded by the doc's own
  *    window count), are interval-MERGED doc-locally with a higher-order
  *    aggregate (so the rewrite scan is O(tokens x merged_runs), not
  *    O(tokens x raw_spans)), and meet the text in one join keyed on
  *    doc_id — the single exchange that moves text, unavoidable for an
  *    operator whose OUTPUT is the rewritten text (bucketing docs by id
  *    makes even that exchange free).
  *  - No driver collect anywhere; every stage is a key-equality
  *    shuffle. Window-hash collisions (xxhash64) would merge unrelated
  *    windows at ~2^-64 per pair — negligible at corpus scale.
  *
  * Reference scope: zhengkw/edu-online has no dedup at all; this
  * extends the engine's dedup family (SURVEY.md "beyond-reference"
  * training-data operators) alongside [[Dedup.winnowOverlapSpans]],
  * which REPORTS overlap spans but does not rewrite.
  */
object SpanDedup {

  /** Corpus-wide duplicated-token-run excision (see object doc).
    *
    * Returns one row per MODIFIED document:
    * (doc_id, n_tokens, n_removed, clean_text) where `clean_text` is the
    * original token stream minus every token covered by a duplicated
    * length-`windowTokens` window whose first (doc_id, pos) occurrence
    * lies elsewhere. Unmodified documents are omitted (the interesting
    * output; callers wanting the full corpus left-join this back).
    *
    * Contracts and degenerate cases:
    *  - Tokenization is SINGLE-SPACE split (`split(text, " ")`): the
    *    rewrite round-trips via `concat_ws(" ", ...)` losslessly, so
    *    correctness never depends on whitespace kind, but runs that
    *    differ only in tab/newline separators are distinct tokens and
    *    escape dedup (recall, not correctness). Normalize whitespace
    *    upstream if that recall matters.
    *  - Periodic / self-overlapping text follows Lee-et-al semantics:
    *    every non-first duplicated window is excised, so a doc of N >=
    *    2L identical tokens keeps only the prefix no later window
    *    covers — the surviving copy can be SHORTER than L (e.g. one
    *    token for a constant-token doc). "First occurrence survives"
    *    is a per-window guarantee, not a per-run one; content bridging
    *    two excised regions is likewise removed when every window
    *    through it is a duplicate.
    *
    * @param windowTokens duplicated-run granularity L: a run must span
    *   at least L consecutive tokens to be excised (50 in Lee et al.)
    */
  def excise(docs: DataFrame, windowTokens: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2,
      s"SpanDedup.excise: windowTokens must be >= 2, got $windowTokens")
    val L = windowTokens
    // materialize both reused relations checkpoint-style: `b` feeds
    // fingerprinting AND the final rewrite join; `occ` feeds the
    // canonical aggregate AND the span join-back. Without reuse, the
    // tokenize+hash projection and the triple explode re-execute once
    // per referencing branch. Not Dataset.persist — both ride into the
    // returned plan, so a cache entry would be caller-unreleasable
    // (the [[Materialize]] discipline).
    val b = Materialize.eager(tokenBase(docs, idCol, textCol))
    val occ = Materialize.eager(winOcc(b, L))

    // the ONLY corpus-wide exchange: 20-byte (fp, id, pos) triples
    // keyed on fp; first occurrence in (doc_id, pos) order is canonical,
    // every later occurrence marks its L tokens for removal. Canonical
    // selection is min(struct) — partial-aggregable, so hot fingerprints
    // collapse map-side; a row_number window here would sort every
    // occurrence of a hot fingerprint on one task (see object doc).
    val canon = occ.groupBy(col("_fp"))
      .agg(min(struct(col("_id"), col("_pos"))).as("_c"),
        count(lit(1)).as("_df"))
      .filter(col("_df") > 1) // unique windows never join back
      .select(col("_fp"), col("_c._id").as("_cid"),
        col("_c._pos").as("_cpos"))
    val spans = occ.join(canon, Seq("_fp"))
      .filter(col("_id") =!= col("_cid") || col("_pos") =!= col("_cpos"))
    rewrite(b, spans, L, idCol)
  }

  /** Full-corpus variant of [[excise]]: EVERY document surfaces, so the
    * output IS the deduplicated training corpus (the x110
    * materialization contract) — modified docs carry their rewritten
    * text, untouched docs their original text with `n_removed` = 0.
    *
    * Scale shape: [[excise]]'s plan plus ONE id-keyed left join of the
    * (∝ modified docs) rewrite relation back onto the corpus and a
    * doc-local token count — no new corpus-wide exchange beyond the
    * join that already moves text (bucketing docs by id makes it
    * co-located). Null-text documents pass through with zero counts
    * and null `clean_text`.
    *
    * Output: (idCol, n_tokens, n_removed, clean_text) — one row per
    * input document. */
  def exciseAll(docs: DataFrame, windowTokens: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val mod = excise(docs, windowTokens, idCol, textCol)
      .select(col(idCol), col("n_removed").as("_nr"),
        col("clean_text").as("_ct"))
    docs.join(mod, Seq(idCol), "left")
      .select(col(idCol),
        when(col(textCol).isNotNull, size(split(col(textCol), " ")))
          .otherwise(0).cast("long").as("n_tokens"),
        coalesce(col("_nr"), lit(0L)).as("n_removed"),
        coalesce(col("_ct"), col(textCol)).as("clean_text"))
  }

  /** The persisted window-fingerprint index for [[exciseDelta]]: one row
    * per distinct length-`windowTokens` window in the AS-INGESTED corpus
    * — (fp, doc_id, pos) with the canonical (first in (doc_id, pos)
    * order) occurrence. Build once, write as parquet; `windowTokens`
    * is baked into the fingerprints, so delta probes must use the same
    * value (document it next to the index). Same skew discipline as
    * [[excise]]: min(struct) hash aggregate, no windows. */
  def fpIndex(docs: DataFrame, windowTokens: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2,
      s"SpanDedup.fpIndex: windowTokens must be >= 2, got $windowTokens")
    winOcc(tokenBase(docs, idCol, textCol), windowTokens)
      .groupBy(col("_fp"))
      .agg(min(struct(col("_id"), col("_pos"))).as("_c"))
      .select(col("_fp").as("fp"), col("_c._id").as("doc_id"),
        col("_c._pos").as("pos"))
  }

  /** Incremental (delta) exact-substring excision: rewrite a NEW batch
    * against a persisted corpus [[fpIndex]] under FIRST-ARRIVAL
    * semantics — any delta window whose fingerprint exists in the index
    * is a duplicate (the corpus occurrence is canonical regardless of
    * id order), and windows new to the delta dedup among themselves by
    * (doc_id, pos). Output contract: [[excise]] over (corpus THEN
    * delta) in arrival order, restricted to delta documents. Corpus
    * documents are never rewritten by this call — they were cleaned
    * when they arrived.
    *
    * Scale shape: the token/fingerprint kernel runs over the DELTA
    * only; the corpus side is a column-pruned scan of the index's `fp`
    * column feeding one fp-equality join (delta-driven — only indexed
    * fps colliding with delta windows survive). Per-batch cost ∝ delta
    * size; the corpus pays the index build once and appends the
    * delta's new fps after each batch ([[fpIndex]] of the batch,
    * anti-joined on fp, unioned on). */
  def exciseDelta(delta: DataFrame, index: DataFrame,
      windowTokens: Int = 50, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2,
      s"SpanDedup.exciseDelta: windowTokens must be >= 2, got $windowTokens")
    val L = windowTokens
    // same materialization contract as [[excise]] (delta-sized here)
    val b = Materialize.eager(tokenBase(delta, idCol, textCol))
    val occ = Materialize.eager(winOcc(b, L))

    // per-fp delta metadata (skew-safe hash agg), then one left join to
    // the index's fp column: indexed fps remove ALL delta occurrences;
    // delta-only fps remove non-canonical occurrences (df > 1)
    val dCanon = occ.groupBy(col("_fp"))
      .agg(min(struct(col("_id"), col("_pos"))).as("_c"),
        count(lit(1)).as("_df"))
    val idxFps = index.select(col("fp").as("_fp"), lit(true).as("_in"))
    val fpMeta = dCanon.join(idxFps, Seq("_fp"), "left")
      .filter(col("_in").isNotNull || col("_df") > 1)
      .select(col("_fp"), col("_c._id").as("_cid"),
        col("_c._pos").as("_cpos"), col("_in"))
    val spans = occ.join(fpMeta, Seq("_fp"))
      .filter(col("_in").isNotNull ||
        col("_id") =!= col("_cid") || col("_pos") =!= col("_cpos"))
    rewrite(b, spans, L, idCol)
  }

  /** Doc-local base relation (_id, _t, _toks, _n). */
  private def tokenBase(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Parallelism.fanOutScan(docs
        .filter(col(textCol).isNotNull)
        .select(col(idCol).as("_id"), col(textCol).as("_t")))
      .select(col("_id"), col("_t"), split(col("_t"), " ").as("_toks"))
      .withColumn("_n", size(col("_toks")))

  /** Per-position window fingerprints (_id, _pos, _fp) — ONE doc-local
    * O(n) kernel pass ([[graft.functions.TokenWindowOps]]: per-token
    * hashes once, then a rolling degree-(L-1) polynomial — the
    * declarative `xxhash64(slice(...))` per position costs O(n·L),
    * 50 corpus passes' worth of hashing at the Lee-et-al L = 50), then
    * the 20-byte triple explode. Positions are 1-based. */
  private def winOcc(b: DataFrame, L: Int): DataFrame =
    b.select(col("_id"),
      posexplode(graft.functions.TokenWindowExprs
        .tokenWindowFps(col("_t"), L)).as(Seq("_p0", "_fp")))
      .select(col("_id"), (col("_p0") + 1).as("_pos"), col("_fp"))

  /** Shared tail: per-doc span aggregation, doc-local interval merge,
    * and the token-filter rewrite. `spanRows` = (_id, _pos, ...) rows
    * marking a removed window at _pos. The join on _id is the one
    * exchange that moves text.
    *
    * The interval merge runs on the SPANS side, below the join's
    * exchange boundary, so `_runs` materializes ONCE per doc. Computed
    * after the join it would be a projection Catalyst collapses into
    * the per-token `exists` lambda — re-folding the merge for every
    * token, O(tokens × spans) array-building per doc instead of
    * O(spans + tokens × runs). That exact inlining (plus the same
    * lambda duplicated into a non-codegen join condition by the
    * always-true modified-doc filter this version drops — every doc
    * in `spanRows` has ≥ 1 excised window covering ≥ L in-range
    * tokens, so `size(_kept) < _n` held vacuously) measured 23 s vs
    * 7 s at sf1 on the same candidate mass. */
  private def rewrite(b: DataFrame, spanRows: DataFrame, L: Int,
      idCol: String): DataFrame = {
    // doc-local interval merge: sorted spans fold into disjoint runs
    val emptyRuns = array().cast("array<struct<s:int,e:int>>")
    val lastOf = (acc: org.apache.spark.sql.Column) => element_at(acc, -1)
    val merged = aggregate(
      array_sort(collect_list(col("_sp"))), emptyRuns, (acc, sp) =>
        when(size(acc) === 0 || lastOf(acc)("e") < sp("s") - 1,
          concat(acc, array(sp.cast("struct<s:int,e:int>"))))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(lastOf(acc)("s").as("s"),
              greatest(lastOf(acc)("e"), sp("e")).as("e"))))))
    val runs = spanRows
      .select(col("_id"), struct(col("_pos").as("s"),
        (col("_pos") + (L - 1)).as("e")).as("_sp"))
      .groupBy(col("_id"))
      .agg(merged.as("_runs"))

    // keep tokens not covered by any merged run (1-based position i+1
    // vs inclusive [s, e]); every joined doc is modified by
    // construction (see scaladoc), so no post-filter
    b.join(runs, Seq("_id"))
      .withColumn("_kept", filter(col("_toks"), (t, i) =>
        !exists(col("_runs"),
          sp => (i + 1) >= sp("s") && (i + 1) <= sp("e"))))
      .select(col("_id").as(idCol),
        col("_n").cast("long").as("n_tokens"),
        (col("_n") - size(col("_kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("_kept")).as("clean_text"))
  }
}
