package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnigramExprs

/** Unigram-LM (SentencePiece-style, Kudo ACL'18) tokenization — the
  * OTHER production tokenizer family next to BPE ([[Vocab]]): a
  * vocabulary of variable-length pieces with frequencies, and encode =
  * Viterbi argmax segmentation under the induced unigram likelihood.
  * Three surfaces:
  *
  *   - [[seedVocab]]: the standard seed — every substring of the
  *     word-frequency dictionary up to `maxPieceLen`, counted with
  *     within-word multiplicity and weighted by word frequency; all
  *     single characters are kept unconditionally (coverage floor),
  *     multi-char pieces keep the `vocabSize` most frequent above
  *     `minCount` ((freq DESC, piece ASC) — a total order, so the cut
  *     is deterministic).
  *   - [[encode]] / [[encodeIds]]: Viterbi segmentation per word
  *     ([[graft.functions.UnigramOps]] — see its determinism
  *     contract), doc-local, vocabulary baked into the plan as bounded
  *     literals. Ids are the 1-based rank in the piece-ascending
  *     sorted vocabulary (the x115 id contract; 0 = UNK single char).
  *   - [[reestimate]]: one hard-EM (Viterbi-EM) count step — piece
  *     usage frequencies under the current model's argmax
  *     segmentation, the re-estimation half of the SentencePiece
  *     trainer loop with the E-step's expectation replaced by the
  *     Viterbi path (the standard deterministic variant).
  *
  * Scale shape (the [[Vocab.bpeMergesChar]] dictionary discipline):
  * every corpus-sized pass is ONE whitespace-word aggregate; substring
  * explosion, vocabulary ranking and re-estimation all run over the
  * Zipf-few DISTINCT words weighted by multiplicity — provably equal
  * to occurrence-stream counting since words segment independently of
  * context. Encode is a doc-local projection: no shuffle, no join.
  * The vocabulary itself is driver-bounded (`collectVocab` cap) —
  * production vocabularies are ≤ a few hundred thousand rows.
  */
object Unigram {

  private def words(textCol: Column): Column =
    array_remove(split(textCol, "\\s+"), "")

  /** Word-frequency dictionary: one corpus pass, distinct-word-sized
    * shuffle (map-side combined). */
  private def wordFreqs(docs: DataFrame, textCol: Column): DataFrame =
    // no fan-out: word explode + count is a cheap pass whose
    // single-task cost sits below the repartition's shuffle + small-
    // task overhead (round-17 A/B at 32 cores: 0.26 s single-task vs
    // 0.41 s fanned — the round-16 fan-out was a net loss here)
    docs.filter(textCol.isNotNull).select(textCol.as("_t"))
      .select(explode(words(col("_t"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))

  /** Seed (piece, freq) vocabulary — see the object doc. Output:
    * `piece` string, `freq` long. */
  def seedVocab(docs: DataFrame, textCol: Column, maxPieceLen: Int = 4,
      minCount: Long = 2, vocabSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"seedVocab: maxPieceLen must be in [1, 16], got $maxPieceLen")
    require(minCount >= 1, s"seedVocab: minCount must be >= 1, got $minCount")
    require(vocabSize >= 0, s"seedVocab: vocabSize must be >= 0, got $vocabSize")
    val wf = wordFreqs(docs, textCol)
    // all substrings up to maxPieceLen WITH within-word multiplicity
    // ("aaa" contributes "a"×3, "aa"×2), weighted by word frequency.
    // The substring generator is the INLINE child of the explode —
    // SPARK-36715 keeps filter inference off inline generator
    // children, so the expensive projection cannot be pushed anywhere
    // (and wf is distinct-word-sized anyway).
    val subs = wf.select(col("wf"), explode(flatten(transform(
        filter(sequence(lit(1), lit(maxPieceLen)),
          l => l <= length(col("w"))),
        l => transform(sequence(lit(1), length(col("w")) - l + 1),
          s => col("w").substr(s, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wf")).as("freq"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs
      .filter(length(col("piece")) > 1 && col("freq") >= minCount)
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(vocabSize)
    chars.unionAll(multi)
      .select(col("piece"), col("freq").cast("long").as("freq"))
  }

  /** Bounded driver collect of a (piece, freq) vocabulary, sorted by
    * piece in UTF8 binary order (the id contract), validated the
    * [[Vocab.collectMergeTable]] way: a null/duplicate piece or a
    * non-positive/null freq fails loudly with the table named, instead
    * of an opaque NPE or a silent arbitrary alignment. */
  private[graft] def collectVocab(vocab: DataFrame,
      cap: Int = 100000): (Seq[String], Seq[Long]) = {
    require(cap >= 1 && cap <= 1000000,
      s"collectVocab: cap must be in [1, 1e6], got $cap")
    val rows = vocab.select(col("piece").cast("string"),
      col("freq").cast("long")).take(cap + 1)
    require(rows.length <= cap,
      s"collectVocab: vocabulary exceeds the $cap cap " +
        "(bounded fetch hit cap + 1 rows)")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "collectVocab: vocabulary has a null piece or freq — the " +
        "relation/artifact is corrupt")
    require(rows.forall(_.getLong(1) > 0),
      "collectVocab: vocabulary has a non-positive freq — the " +
        "relation/artifact is corrupt")
    val sorted = rows.sortBy(r => UTF8String.fromString(r.getString(0)))
    require(sorted.iterator.map(_.getString(0)).toSet.size == sorted.length,
      "collectVocab: vocabulary has duplicate pieces — the " +
        "relation/artifact is corrupt")
    (sorted.map(_.getString(0)).toSeq, sorted.map(_.getLong(1)).toSeq)
  }

  /** Viterbi-encode every document: output (`id`, `pieces`,
    * `n_tokens`). Doc-local projection — the vocabulary rides the plan
    * as two bounded literal arrays. */
  def encode(docs: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.encode(w, pl, fl))).as("pieces"))
      .withColumn("n_tokens", size(col("pieces")).cast("long"))
  }

  /** [[encode]] as 1-based sorted-vocabulary ids (0 = UNK single
    * char): output (`id`, `ids`, `n_tokens`). */
  def encodeIds(docs: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.encodeIds(w, pl, fl))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** WordPiece-style greedy longest-match ("max-munch") encode — the
    * BERT inference rule over the same vocabulary artifact: output
    * (`id`, `pieces`, `n_tokens`), doc-local projection like
    * [[encode]]. Completes the tokenizer-inference trio (BPE merges /
    * unigram Viterbi / WordPiece max-munch) over one artifact format. */
  def wordpieceEncode(docs: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.wordpiece(w, pl, fl))).as("pieces"))
      .withColumn("n_tokens", size(col("pieces")).cast("long"))
  }

  /** [[wordpieceEncode]] as 1-based sorted-vocabulary ids (0 = UNK
    * single char — the x130 id contract shared by the whole tokenizer
    * trio): output (`id`, `ids`, `n_tokens`). Doc-local projection
    * like [[encodeIds]] — the vocabulary rides the plan as bounded
    * literals; ids are positions in the piece-ascending sorted
    * vocabulary, so a BPE / unigram / WordPiece consumer reads one id
    * space per artifact. */
  def wordpieceEncodeIds(docs: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.wordpieceIds(w, pl, fl))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** BERT-style WordPiece vocabulary [Devlin et al., NAACL 2019]:
    * word-INITIAL substrings count as plain pieces, word-INTERNAL
    * substrings as `##`-prefixed continuation pieces — the two forms
    * are distinct vocabulary entries with separate counts, exactly the
    * published layout. All single characters (both forms) are kept
    * unconditionally (the coverage floor that keeps `[UNK]` rare);
    * multi-char pieces keep the `vocabSize` most frequent above
    * `minCount` by the (freq DESC, piece ASC) total order. Same
    * dictionary discipline as [[seedVocab]]: one corpus pass, then
    * everything is distinct-word-sized. Output (`piece`, `freq`). */
  def wordpieceVocab(docs: DataFrame, textCol: Column,
      maxPieceLen: Int = 4, minCount: Long = 2,
      vocabSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"wordpieceVocab: maxPieceLen must be in [1, 16], got $maxPieceLen")
    require(minCount >= 1,
      s"wordpieceVocab: minCount must be >= 1, got $minCount")
    require(vocabSize >= 0,
      s"wordpieceVocab: vocabSize must be >= 0, got $vocabSize")
    val wf = wordFreqs(docs, textCol)
    val subs = wf.select(col("wf"), explode(flatten(transform(
        filter(sequence(lit(1), lit(maxPieceLen)),
          l => l <= length(col("w"))),
        l => transform(sequence(lit(1), length(col("w")) - l + 1),
          s => when(s === 1, col("w").substr(s, l))
            .otherwise(concat(lit("##"), col("w").substr(s, l)))))))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("wf")).as("freq"))
    // raw length = piece length minus the tag; a word-initial literal
    // "##x" is indistinguishable from a continuation "x" — the
    // published format has the same collision and the oracle mirrors
    // the same concat, so both engines agree
    val rawLen = when(col("piece").startsWith("##"),
      length(col("piece")) - 2).otherwise(length(col("piece")))
    val chars = subs.filter(rawLen === 1)
    val multi = subs.filter(rawLen > 1 && col("freq") >= minCount)
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(vocabSize)
    chars.unionAll(multi)
      .select(col("piece"), col("freq").cast("long").as("freq"))
  }

  /** Internal word-initial tag for the likelihood trainer's symbol
    * space: marking the FIRST symbol (instead of `##` on every
    * continuation) makes a merge a PLAIN CONCATENATION — l ⊕ r stays
    * correctly tagged for both initial and continuation results — so
    * the proven greedy merge-application kernel
    * ([[graft.functions.BpeExprs.encode]], sep = "") applies
    * unchanged, and the published `##` layout is recovered by one
    * rendering projection at the end. */
  private val InitMarker = "\u0001"

  /** LIKELIHOOD-scored WordPiece trainer — the published objective
    * [Schuster & Nakajima 2012; Wu et al. 2016 §4.1, as shipped by
    * BERT]: starting from single characters, iteratively merge the
    * adjacent symbol pair maximizing
    *
    *   score(l, r) = freq(l ⊕ r) / (freq(l) · freq(r))
    *
    * — the pair whose merge most increases the corpus likelihood
    * under a unigram model — instead of raw pair frequency (BPE).
    * Selection is SEQUENTIAL (one merge per round — the likelihood
    * ranking re-weights with every merge, so the BPE batching proof
    * does not carry over) with the deterministic total order
    * (score DESC, l ASC, r ASC over the tagged symbols) and a
    * weighted pair-occurrence floor `minCount`; scores are exact
    * integer counts with exactly two IEEE roundings (the product and
    * the division), so every round replays bit-exactly on any IEEE
    * engine (the x143 oracle chains one CTE group per round).
    *
    * Scale shape — the dictionary discipline: ONE corpus pass builds
    * the word-frequency dictionary; every round's pair count, symbol
    * count and merge application run over Zipf-few DISTINCT words
    * weighted by multiplicity (lineage-truncated between rounds).
    * Symbol counts include single-symbol words (they hold no pairs
    * but DO deflate their symbol's score — the published objective
    * counts the whole corpus).
    *
    * Output: the [[wordpieceVocab]] tagged (piece, freq) contract —
    * single-character coverage entries (both forms, seed counts)
    * plus one entry per committed merge (freq = its weighted
    * occurrence count at merge time; re-created pieces dedup by
    * summing) — so [[wordpieceBertEncode]]/[[wordpieceBertEncodeIds]]
    * consume it directly and the encode kernels are untouched. A word
    * containing the internal tag character U+0001 fails loudly (out
    * of contract, like the published format's literal-`##`
    * collision). */
  def wordpieceVocabLikelihood(docs: DataFrame, textCol: Column,
      nMerges: Int, minCount: Long = 2): DataFrame = {
    require(nMerges >= 1 && nMerges <= 256,
      s"wordpieceVocabLikelihood: nMerges must be in [1, 256], " +
        s"got $nMerges")
    require(minCount >= 1,
      s"wordpieceVocabLikelihood: minCount must be >= 1, got $minCount")
    val spark = docs.sparkSession
    import spark.implicits._
    def truncated(d: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        d.checkpoint(eager = false)
      else d.localCheckpoint(eager = false)
    // word-frequency dictionary with tagged single-char symbols:
    // ["" + c1, c2, ..., cn] — one corpus pass, then every
    // round is distinct-word-sized
    val guarded = when(col("w").contains(InitMarker),
      raise_error(lit("wordpieceVocabLikelihood: a word contains the " +
        "internal tag character U+0001 — out of contract")))
      .otherwise(col("w"))
    var dict = wordFreqs(docs, textCol)
      .select(col("wf").as("n"), transform(
        sequence(lit(1), length(guarded)),
        i => when(i === 1,
            concat(lit(InitMarker), guarded.substr(i, lit(1))))
          .otherwise(guarded.substr(i, lit(1)))).as("s"))
    // seed coverage entries: every initial single-char symbol (both
    // forms), rendered, with its seed count
    val charEntries = dict
      .select(col("n"), explode(col("s")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("n")).as("freq"))
      .select(renderTagged(col("sym")).as("piece"), col("freq"))
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // ONE tagged pair∪symbol explode + ONE shuffle per round (§2.4,
      // round-17): pair rows carry (l, r), symbol rows (sym, null) —
      // a zip_with pair's r is never null, so the slices are disjoint
      // and both counts are exactly the two separate aggregates this
      // fuses (the joins below then read the SAME exchange three
      // times via Spark's exchange reuse instead of shuffling twice)
      val tagged = dict
        .select(col("n").as("_wt"), explode(concat(
          when(size(col("s")) >= 2,
            zip_with(
              slice(col("s"), lit(1), size(col("s")) - 1),
              slice(col("s"), lit(2), size(col("s")) - 1),
              (a, b) => struct(a.as("l"), b.as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>")),
          transform(col("s"), x =>
            struct(x.as("l"), lit(null).cast("string").as("r")))))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("_wt")).as("n"))
      val pairs = tagged.filter(col("r").isNotNull)
        .filter(col("n") >= minCount)
      val syms = tagged.filter(col("r").isNull)
        .select(col("l").as("sym"), col("n").as("c"))
      // score = n / (c(l)·c(r)): exact integers, the double product
      // and division are the only roundings — bit-identical in any
      // IEEE engine, so the (score DESC, l, r) pick replays exactly
      val best = pairs
        .join(syms.select(col("sym").as("l"), col("c").as("cl")), Seq("l"))
        .join(syms.select(col("sym").as("r"), col("c").as("cr")), Seq("r"))
        .select(col("l"), col("r"), col("n"),
          (col("n").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long, Double)]
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n, _) = best.head
        merges += ((l, r, n))
        dict = truncated(dict.select(col("n"),
          graft.functions.BpeExprs.encode(col("s"),
            typedlit(Seq(l)), typedlit(Seq(r)), "").as("s")))
      }
      round += 1
    }
    val mergeEntries = merges.result()
      .map { case (l, r, n) => (renderRaw(l + r), n) }
      .toDF("piece", "freq")
    // re-created pieces (a later merge can rebuild an earlier output
    // symbol via a different split) dedup by summing — deterministic
    // and order-free
    charEntries.unionAll(mergeEntries)
      .groupBy(col("piece"))
      .agg(sum(col("freq")).cast("long").as("freq"))
  }

  /** Render one internally-tagged symbol to the published layout:
    * strip the initial marker, or `##`-prefix a continuation. */
  private def renderTagged(sym: Column): Column =
    when(sym.startsWith(InitMarker), sym.substr(lit(2), length(sym)))
      .otherwise(concat(lit("##"), sym))

  private def renderRaw(sym: String): String =
    if (sym.startsWith(InitMarker)) sym.substring(1) else "##" + sym

  /** BERT WordPiece encode over a [[wordpieceVocab]]-shaped (tagged)
    * vocabulary: greedy longest match with `##` continuation lookups,
    * whole-word `[UNK]` when a visited position has no match (see
    * [[graft.functions.UnigramOps.maxMunchBert]]). Output (`id`,
    * `pieces`, `n_tokens`) — doc-local projection like every encode
    * route. */
  def wordpieceBertEncode(docs: DataFrame, idCol: Column,
      textCol: Column, vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.wordpieceBert(w, pl, fl))).as("pieces"))
      .withColumn("n_tokens", size(col("pieces")).cast("long"))
  }

  /** [[wordpieceBertEncode]] as 1-based sorted-vocabulary ids
    * (0 = `[UNK]`): output (`id`, `ids`, `n_tokens`).
    *
    * `fanOut = true` spreads the (CPU-dense, per-word-occurrence)
    * encode kernel across cores when the scan is narrower than the
    * session parallelism (§2.5 — round-17: x144's decode composition
    * ran its whole 1.9 s kernel on 1 of 32 cores). Default FALSE:
    * x141's pure-projection zero-exchange plan law (PlanSpec) is the
    * 100 TB shape and stays pinned. */
  def wordpieceBertEncodeIds(docs: DataFrame, idCol: Column,
      textCol: Column, vocab: DataFrame,
      fanOut: Boolean = false): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    val in = docs.filter(textCol.isNotNull)
      .select(idCol.as("id"), textCol.as("_t"))
    (if (fanOut) Parallelism.fanOutScan(in) else in)
      .select(col("id"),
        flatten(transform(words(col("_t")),
          w => UnigramExprs.wordpieceBertIds(w, pl, fl))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** Decode unigram token-id arrays back to TEXT against the sorted
    * vocabulary array (the [[encodeIds]] id space: 1-based rank,
    * 0 = UNK): piece concatenation — the standard detokenization for
    * a flat unigram piece stream, which carries no word-boundary
    * markers, so `decode ∘ encode` reproduces the input with
    * WHITESPACE REMOVED (the UnigramSpec round-trip law). UNK (0) and
    * out-of-range ids decode to U+FFFD (REPLACEMENT CHARACTER) — a
    * visible placeholder instead of silently vanishing characters
    * (the documented placeholder policy; an UNK'd char is not
    * recoverable from id 0 by construction). Doc-local projection —
    * the inspection surface over shipped id shards. */
  def unigramDecodeIds(ids: Column, sortedVocab: Column): Column =
    concat_ws("", transform(ids, i =>
      coalesce(
        when(i >= 1 && i <= size(sortedVocab),
          element_at(sortedVocab, i.cast("int"))),
        lit("�"))))

  /** Decode BERT WordPiece id arrays back to TEXT against the sorted
    * TAGGED vocabulary (the [[wordpieceBertEncodeIds]] id space): the
    * published detokenization — a `##`-prefixed piece strips its tag
    * and joins the current word, any other piece starts a NEW word
    * (single-space separated). Word boundaries ARE recoverable here
    * (word-initial pieces are never `##`-tagged), so
    * `decode ∘ encode` reproduces the whitespace-normalized input
    * exactly wherever no word collapsed to `[UNK]`; id 0 and
    * out-of-range ids decode to the literal `[UNK]` (the placeholder
    * policy — BERT's own rendering). Doc-local left fold. */
  def wordpieceBertDecodeIds(ids: Column, sortedVocab: Column): Column = {
    val pieces = transform(ids, i =>
      coalesce(
        when(i >= 1 && i <= size(sortedVocab),
          element_at(sortedVocab, i.cast("int"))),
        lit("[UNK]")))
    aggregate(pieces, lit(""), (acc, p) =>
      when(p.startsWith("##"), concat(acc, substring(p, 3, 1 << 30)))
        .otherwise(when(acc === "", p)
          .otherwise(concat(acc, lit(" "), p))))
  }

  /** One hard-EM re-estimation step: corpus piece-usage counts under
    * the current vocabulary's Viterbi segmentation. Output (`piece`,
    * `usage`) for every USED piece — including UNK single chars, which
    * is what tells the trainer loop its coverage floor is being hit.
    *
    * Dictionary route: each DISTINCT word segments once and its usage
    * weights by word frequency — ≡ occurrence counting (words segment
    * context-free). The encode feeds an explode across the aggregate
    * boundary, exactly the InferFiltersFromGenerate hazard shape —
    * explode_outer + an isNotNull filter ON THE GENERATE OUTPUT is the
    * pushdown barrier (the [[Vocab]] round-10 discipline). */
  def reestimate(docs: DataFrame, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    wordFreqs(docs, textCol)
      .select(col("wf"),
        explode_outer(UnigramExprs.encode(col("w"), pl, fl)).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy(col("piece")).agg(sum(col("wf")).as("usage"))
  }

  /** One SOFT-EM re-estimation step — the SentencePiece paper's
    * E-step proper (Kudo ACL'18 §3.2): expected piece counts from a
    * FORWARD–BACKWARD pass over each word's full segmentation lattice
    * ([[graft.functions.UnigramOps.softCounts]] and its determinism
    * contract), instead of [[reestimate]]'s Viterbi argmax counts
    * (the hard-EM variant). Output (`piece`, `exp_usage` double,
    * rounded 6dp) for every piece with lattice mass — UNK single
    * chars included.
    *
    * Engine-portable corpus sum: the per-(word, piece) expectation is
    * a deterministic IEEE double on both engines, but a corpus SUM of
    * doubles is summation-order-dependent — so each word's weighted
    * contribution `wf · E` rounds ONCE to DECIMAL(28,10) and the
    * corpus total is an exact decimal sum (order-free, the repo's
    * dsum convention), cast back to double at the end.
    *
    * Scale shape: the dictionary discipline of [[reestimate]] — one
    * corpus word aggregate, then the lattice pass runs per DISTINCT
    * word (explode_outer + isNotNull as the InferFiltersFromGenerate
    * pushdown barrier), and the result aggregate is vocabulary-sized
    * with map-side combine. */
  def softReestimate(docs: DataFrame, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    wordFreqs(docs, textCol)
      .select(col("wf"),
        explode_outer(UnigramExprs.softCounts(col("w"), pl, fl))
          .as("pc"))
      .filter(col("pc").isNotNull)
      .select(col("pc.piece").as("piece"),
        (col("wf").cast("double") * col("pc.e"))
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))
          .as("_c"))
      .groupBy(col("piece"))
      .agg(round(sum(col("_c")).cast("double"), 6).as("exp_usage"))
  }

  /** One EM + prune round of the SentencePiece trainer loop: usage
    * counts under the CURRENT vocabulary's Viterbi segmentation
    * ([[reestimate]] — the hard-EM E/M step), then the prune rule:
    *
    *   - every single-char piece of the current vocabulary survives
    *     with `freq = coalesce(usage, 1)` — the coverage floor, freq
    *     1 mirroring the encode kernel's UNK-single-char rule so an
    *     unused char keeps a positive (minimal) mass;
    *   - multi-char pieces keep the `keepMulti` most USED, ranked by
    *     the total order (usage DESC, piece ASC) — unused multi-char
    *     pieces are dropped unconditionally (zero-mass pieces cannot
    *     be ranked and would never win a Viterbi path again).
    *
    * Output (`piece`, `freq`) — the next round's model, freqs = usage
    * counts (exact integers, so the next Viterbi stays in the
    * [[graft.functions.UnigramOps]] determinism contract). */
  def emRound(docs: DataFrame, textCol: Column, vocab: DataFrame,
      keepMulti: Int): DataFrame = {
    require(keepMulti >= 0,
      s"emRound: keepMulti must be >= 0, got $keepMulti")
    val usage = reestimate(docs, textCol, vocab)
    val joined = vocab.select(col("piece"))
      .join(usage, Seq("piece"), "left")
    val chars = joined.filter(length(col("piece")) === 1)
      .select(col("piece"),
        coalesce(col("usage"), lit(1L)).cast("long").as("freq"))
    val multi = joined
      .filter(length(col("piece")) > 1 && col("usage").isNotNull)
      .orderBy(col("usage").desc, col("piece").asc)
      .limit(keepMulti)
      .select(col("piece"), col("usage").cast("long").as("freq"))
    chars.unionAll(multi)
  }

  /** The deterministic SentencePiece training loop (Kudo ACL'18 §3.2,
    * hard-EM variant): seed with [[seedVocab]], then `rounds` ×
    * [[emRound]], the multi-char budget shrinking geometrically by 3/4
    * per round (the SentencePiece shrinking-factor discipline) but
    * never below `targetMulti`. Every step is a deterministic total
    * order over exact integer counts, so the whole loop replays
    * hash-exactly on another engine (the x139 oracle runs 2 full
    * rounds in recursive SQL). Each round's vocabulary materializes
    * eagerly ([[Materialize.eager]]) — it is consumed twice (collected
    * as the next round's model literal AND joined by the prune), and
    * the rounds would otherwise recompute the whole chain per
    * consumer. Output (`piece`, `freq`) — feed [[saveUnigramTokenizer]]
    * / [[encode]] / [[encodeIds]]. */
  def trainUnigram(docs: DataFrame, textCol: Column,
      maxPieceLen: Int = 4, minCount: Long = 2, vocabSize: Int = 512,
      rounds: Int = 2, targetMulti: Int = 0): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"trainUnigram: rounds must be in [1, 16], got $rounds")
    require(targetMulti >= 0,
      s"trainUnigram: targetMulti must be >= 0, got $targetMulti")
    var vocab = seedVocab(docs, textCol, maxPieceLen, minCount, vocabSize)
    var keep = vocabSize
    var r = 0
    while (r < rounds) {
      keep = math.max(targetMulti, keep * 3 / 4)
      vocab = Materialize.eager(emRound(docs, textCol, vocab, keep))
      r += 1
    }
    vocab
  }

  // ---- tokenizer artifact (the Vocab.saveBpeTokenizer seam) ---------

  private val UnigramArtifactVersion = 1

  /** Persist a (piece, freq) vocabulary as a versioned on-disk
    * tokenizer — the production seam between the offline trainer and
    * every consumer (batch encode jobs,
    * [[graft.streaming.StreamUnigramTokenize]] ingestion, other
    * clusters): `<path>/vocab` holds the table as parquet,
    * `<path>/meta` one row of (version, n_pieces). The bounded
    * validating collect runs FIRST, so a corrupt vocabulary fails
    * loudly before anything is written. Overwrites `path`. */
  def saveUnigramTokenizer(vocab: DataFrame, path: String): Unit = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val n = collectVocab(vocab)._1.size // validates shape + bound
    vocab.select(col("piece").cast("string"), col("freq").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    Seq((UnigramArtifactVersion, n.toLong))
      .toDF("version", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[saveUnigramTokenizer]] artifact, verifying the version
    * and the completeness stamp. Load-path equality contract (the
    * UnigramSpec gate): [[encode]]/[[encodeIds]] from a loaded
    * artifact equal the same call on the freshly-trained vocabulary,
    * byte for byte. */
  def loadUnigramTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"loadUnigramTokenizer: expected 1 meta row at $path/meta, " +
        s"got ${meta.length}")
    val m = meta(0)
    val version = m.getAs[Int]("version")
    require(version == UnigramArtifactVersion,
      s"loadUnigramTokenizer: unsupported artifact version $version " +
        s"(this build reads $UnigramArtifactVersion)")
    val vocab = spark.read.parquet(s"$path/vocab")
    val n = vocab.count()
    require(n == m.getAs[Long]("n_pieces"),
      s"loadUnigramTokenizer: table has $n rows, stamp says " +
        s"${m.getAs[Long]("n_pieces")} — incomplete or mixed artifact")
    vocab
  }
}
