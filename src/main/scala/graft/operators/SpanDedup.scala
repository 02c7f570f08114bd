package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  *  - Duplicate detection is ONE hash exchange of the triples keyed on
  *    fp + a per-fp rank (first occurrence in (doc_id, pos) order is
  *    canonical). Fingerprint groups are tiny (df of one window), so the
  *    rank is a well-partitioned window, never a global sort.
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
    * @param windowTokens duplicated-run granularity L: a run must span
    *   at least L consecutive tokens to be excised (50 in Lee et al.)
    */
  def excise(docs: DataFrame, windowTokens: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2,
      s"SpanDedup.excise: windowTokens must be >= 2, got $windowTokens")
    val L = windowTokens

    // doc-local: token array, per-token hashes, per-position window
    // fingerprints (xxhash64 of the length-L token-hash slice — hashing
    // the hash array, not a re-concatenated string, keeps the projection
    // O(L) longs per position instead of O(L) string bytes)
    val toks = split(col(textCol), " ")
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), col(textCol).as("_t"),
        toks.as("_toks"))
      .withColumn("_n", size(col("_toks")))
    val tokHashes = transform(col("_toks"), t => xxhash64(t))
    val winFps = when(col("_n") >= L,
      transform(sequence(lit(1), col("_n") - (L - 1)),
        p => struct(p.as("pos"),
          xxhash64(slice(tokHashes, p, lit(L))).as("fp"))))
      .otherwise(array().cast("array<struct<pos:int,fp:bigint>>"))

    // the ONLY corpus-wide exchange: 20-byte (fp, id, pos) triples
    // keyed on fp; first occurrence in (doc_id, pos) order is canonical,
    // every later occurrence marks its L tokens for removal
    val occ = base
      .select(col("_id"), explode(winFps).as("_w"))
      .select(col("_id"), col("_w.pos").as("_pos"), col("_w.fp").as("_fp"))
    val ranked = occ.withColumn("_rn",
      row_number().over(
        Window.partitionBy(col("_fp")).orderBy(col("_id"), col("_pos"))))
    val spans = ranked.filter(col("_rn") > 1)
      .select(col("_id"), struct(col("_pos").as("s"),
        (col("_pos") + (L - 1)).as("e")).as("_sp"))
      .groupBy(col("_id"))
      .agg(array_sort(collect_list(col("_sp"))).as("_spans"))

    // doc-local interval merge: sorted spans fold into disjoint runs
    val emptyRuns = array().cast("array<struct<s:int,e:int>>")
    val lastOf = (acc: org.apache.spark.sql.Column) => element_at(acc, -1)
    val merged = aggregate(col("_spans"), emptyRuns, (acc, sp) =>
      when(size(acc) === 0 || lastOf(acc)("e") < sp("s") - 1,
        concat(acc, array(sp.cast("struct<s:int,e:int>"))))
        .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(lastOf(acc)("s").as("s"),
            greatest(lastOf(acc)("e"), sp("e")).as("e"))))))

    // rewrite: keep tokens not covered by any merged run (1-based
    // position i+1 vs inclusive [s, e]); the join on _id is the one
    // exchange that moves text
    base.join(spans, Seq("_id"))
      .withColumn("_runs", merged)
      .withColumn("_kept", filter(col("_toks"), (t, i) =>
        !exists(col("_runs"),
          sp => (i + 1) >= sp("s") && (i + 1) <= sp("e"))))
      .filter(size(col("_kept")) < col("_n"))
      .select(col("_id").as(idCol),
        col("_n").cast("long").as("n_tokens"),
        (col("_n") - size(col("_kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("_kept")).as("clean_text"))
  }
}
