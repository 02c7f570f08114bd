package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeExprs, MisraGriesTokens, TextAnalysis}

/** Corpus vocabulary statistics: exact token frequencies / top-k, and
  * sketch-routed heavy hitters for when the distinct-token universe is
  * itself too large to shuffle.
  *
  * Token definition is everywhere `\S+` (the same as
  * [[graft.functions.TextAnalysis.tokenCount]]): [[tokens]] uses
  * `split` + `array_remove` because Spark's `split` keeps edge empty
  * strings, and the MG aggregate tokenizes document-locally with the
  * same pattern — all three routes count identically.
  */
object Vocab {

  /** One row per token occurrence — the exploded token stream. */
  def tokens(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(array_remove(split(textCol, "\\s+"), "")).as("token"))

  /** Exact token frequencies: map-side partial aggregation, shuffle of
    * distinct tokens only. */
  def tokenCounts(df: DataFrame, textCol: Column): DataFrame =
    tokens(df, textCol).groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))

  /** Exact top-k vocabulary with a deterministic (count desc, token
    * asc) tie-break — `TakeOrdered` pushes k into every partition, the
    * driver sees k rows. */
  def topTokens(df: DataFrame, textCol: Column, k: Int): DataFrame = {
    require(k > 0, s"topTokens: k must be > 0, got $k")
    tokenCounts(df, textCol)
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
  }

  /** Tokens whose corpus frequency exceeds `phi · N` (N = total token
    * occurrences), WITHOUT shuffling the distinct-token universe:
    *
    *  1. one corpus pass aggregates a capacity-bounded Misra–Gries
    *     candidate summary and N together (a single small row — no
    *     token-level shuffle; MG guarantees the candidate set is a
    *     superset of every token above N/(capacity+1) regardless of
    *     partial-aggregate merge order);
    *  2. a second pass joins the token stream against the broadcast
    *     candidates and exact-counts only those — shuffle bounded by
    *     `capacity` distinct keys;
    *  3. the exact `> phi·N` filter trims MG's extra survivors, so the
    *     output is exactly the true heavy hitters with exact counts —
    *     deterministic, hash-comparable to an exact-SQL oracle.
    *
    * `capacity` must be ≥ ⌈1/phi⌉ so the MG retention floor
    * N/(capacity+1) sits at or below the phi·N threshold. At exact-
    * top-k-is-fine scales use [[topTokens]]; this is the route for
    * billions of distinct tokens. */
  /** Adjacent-token-pair (bigram) frequencies — the corpus pair
    * statistics a BPE/WordPiece tokenizer trainer consumes. Each
    * document emits its own len−1 adjacent pairs via a doc-local
    * zip (never a self-join of the exploded token stream, which would
    * shuffle the corpus twice to reassemble adjacency); the count is
    * a map-side-combinable aggregate shuffling distinct PAIRS only. */
  def bigramCounts(df: DataFrame, textCol: Column): DataFrame = {
    val tk = array_remove(split(textCol, "\\s+"), "")
    df.select(explode(when(size(tk) >= 2,
        zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => struct(a.as("t1"), b.as("t2"))))
      .otherwise(array().cast("array<struct<t1:string,t2:string>>")))
      .as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Top-k bigrams under the deterministic total order (count desc,
    * t1 asc, t2 asc) — unique per pair, so the k-prefix is stable and
    * engine-portable even through count ties at the boundary. */
  def topBigrams(df: DataFrame, textCol: Column, k: Int): DataFrame = {
    require(k > 0, s"topBigrams: k must be > 0, got $k")
    bigramCounts(df, textCol)
      .orderBy(col("n_occurrences").desc, col("t1").asc, col("t2").asc)
      .limit(k)
  }

  def heavyHitters(df: DataFrame, textCol: Column, phi: Double,
      capacity: Int): DataFrame = {
    require(phi > 0.0 && phi <= 1.0,
      s"heavyHitters: phi must be in (0,1], got $phi")
    require(capacity >= math.ceil(1.0 / phi),
      s"heavyHitters: capacity $capacity < ceil(1/phi) = ${math.ceil(1.0 / phi).toLong}" +
        " — MG could drop a true heavy hitter")
    val summary = df.agg(
      MisraGriesTokens.summary(textCol, capacity).as("cands"),
      sum(TextAnalysis.tokenCount(textCol)).cast("long").as("n"))
    val cands = summary
      .select(explode(col("cands")).as("c"), col("n"))
      .select(col("c.token").as("token"), col("n"))
    tokens(df, textCol)
      .join(broadcast(cands), "token")
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > lit(phi) * col("n"))
      .select(col("token"), col("n_occurrences"))
  }

  /** BPE-style merge training over the corpus: `nMerges` rounds of
    * (count adjacent symbol pairs) → (pick the most frequent pair,
    * ties broken lexicographically) → (apply the merge everywhere,
    * greedy leftmost non-overlapping — the standard BPE application
    * step, via the doc-local [[graft.functions.MergeAdjacentExpr]]
    * kernel). Symbols start as whitespace tokens, so the learned
    * merges are phrase units; the algorithm is tokenization-agnostic —
    * char-level BPE is the same loop over char symbols.
    *
    * Determinism: the argmax order (count desc, left asc, right asc)
    * is total, and the merge pass is a deterministic projection, so
    * the merge table is reproducible anywhere (the spec checks it
    * against an independent single-machine reference implementation).
    *
    * Scale shape — BATCHED exact rounds: each round pays ONE
    * map-side-combinable pair-count shuffle over the training set and
    * then commits a whole PREFIX of the ranked pair list (up to
    * `batchCap` merges) in one fused kernel pass, so the corpus-pass
    * count grows with ⌈nMerges / batch⌉, not nMerges. The prefix is
    * provably identical to running the merges one at a time: a ranked
    * pair joins the batch only while
    *
    *   1. it shares no symbol with an earlier batch member (disjoint
    *      merges commute, destroy none of each other's occurrences,
    *      and leave every untouched pair's count unchanged — so each
    *      member's recorded count is its true at-merge-time count);
    *   2. none of its symbols equals an earlier member's concatenated
    *      output symbol (an earlier merge may create fresh occurrences
    *      of such a pair, changing its true count);
    *   3. its count strictly exceeds every earlier member's creation
    *      bound B = max(max n(·, left), max n(right, ·)) — any pair an
    *      earlier merge CREATES is of the form (x, l⊕r) or (l⊕r, y)
    *      and inherits its count from a snapshot (x, left) /
    *      (right, y) occurrence, so B bounds the best rank a created
    *      pair can reach; strictly below the member's count means no
    *      created pair can outrank it at its sequential turn (the two
    *      per-symbol maxima come from one small aggregate over the
    *      already-shuffled pair counts).
    *
    *   The first ranked pair is always exact (it IS the snapshot
    *   argmax), so every round commits ≥ 1 merge and worst-case
    *   (adversarially interacting pairs) degrades to the sequential
    *   one-merge-per-round loop, never past it.
    *
    * The sequential dependence between rounds is inherent to BPE, so
    * each round still costs a pass over the TRAINING SET — which is
    * why the operator carries its own `sampleFraction` knob:
    * production tokenizer training bounds wall-clock by training on a
    * hash sample (vocabulary statistics converge long before the full
    * corpus is read), and with the knob a raw call is safe at corpus
    * scale instead of requiring the caller to remember to pre-compose
    * [[Corpus.sampleByHash]]. The sample is [[Corpus.hashUnit]] of the
    * text — deterministic, so the learned merge table is reproducible;
    * `sampleFraction = f` is exactly equivalent to pre-sampling with
    * `Corpus.sampleByHash(df, textCol, f)` (the spec asserts this
    * composition law).
    *
    * Output: (merge_idx 0-based, left, right, n_occurrences) — the
    * ordered merge table a tokenizer consumes. */
  def bpeMerges(df: DataFrame, textCol: Column, nMerges: Int,
      minCount: Long = 2L, sep: String = " ",
      sampleFraction: Double = 1.0, batchCap: Int = 32): DataFrame = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"bpeMerges: sampleFraction must be in (0,1], got $sampleFraction")
    val training =
      if (sampleFraction >= 1.0) df
      else Corpus.sampleByHash(df, textCol, sampleFraction)
    // no fan-out: the split-only projection is cheap and the trainer's
    // per-occurrence pair count is a zip_with explode + map-side
    // combine — both measured faster single-task than fanned at 32
    // cores (round-17 A/B, same shape as the dict builds)
    val syms = training.select(textCol.as("_t"))
      .select(array_remove(split(col("_t"), "\\s+"), "").as("s"),
        lit(1L).as("w"))
    bpeTrain(syms, nMerges, minCount, sep, batchCap)
  }

  /** The shared batched trainer loop over WEIGHTED symbol sequences
    * (`s` array<string>, `w` long): pair counts are `sum(w)`, so a
    * per-occurrence relation (w = 1, the [[bpeMerges]] route) and a
    * deduplicated dictionary with multiplicities (the
    * [[bpeMergesChar]] route — Sennrich trains on the word-frequency
    * dictionary, shrinking the per-round kernel pass from token
    * occurrences to Zipf-few distinct words) count identically.
    *
    * Batch-exactness guard #2b (advisory hardening): the equivalence
    * proof's creation bound assumes an accepted member's concat symbol
    * l⊕r is globally fresh. When l⊕r instead already occurs in the
    * SNAPSHOT pair universe (possible in principle via ambiguous
    * sep-join decompositions, and routinely at char level where
    * symbols are plain concatenations), pairs containing it hold
    * pre-existing occurrences ON TOP of the ≤ B created ones, so the
    * bound no longer caps their post-merge rank. The loop therefore
    * checks each candidate's concat against the snapshot symbol
    * universe (one bounded `isin` probe on the cached pair counts,
    * ≤ cap keys) and conservatively ends the batch right after a
    * colliding member — later pairs re-rank next round against fresh
    * counts. Being more conservative only splits rounds differently;
    * the committed merge TABLE stays sequential-identical. */
  private def bpeTrain(syms0: DataFrame, nMerges: Int, minCount: Long,
      sep: String, batchCap: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10000,
      s"bpeTrain: nMerges must be in [1,10000], got $nMerges")
    require(minCount >= 1, s"bpeTrain: minCount must be >= 1, got $minCount")
    require(batchCap >= 1 && batchCap <= 256,
      s"bpeTrain: batchCap must be in [1,256], got $batchCap")
    val spark = syms0.sparkSession
    import spark.implicits._
    def truncated(d: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        d.checkpoint(eager = false)
      else d.localCheckpoint(eager = false)

    var syms = syms0.filter(size(col("s")) >= 2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var idx = 0
    var exhausted = false
    while (idx < nMerges && !exhausted) {
      val cap = math.min(batchCap, nMerges - idx)
      val pc = syms
        .select(col("w"), explode(when(size(col("s")) >= 2,
          zip_with(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1),
            (a, b) => struct(a.as("l"), b.as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("w")).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = pc
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(cap)
        .as[(String, String, Long)]
        .collect()
      if (cands.isEmpty || cands.head._3 < minCount) {
        exhausted = true
        pc.unpersist(false)
      } else {
        // creation bounds + concat-collision probe for the candidate
        // symbols, from the cached pair counts: bounded aggregates
        // (≤ 2·cap keys / ≤ cap keys), only paid when a batch could
        // actually extend past its head — fused into ONE tagged
        // union-aggregate job (round-17: the three separate collects
        // each paid a full job-scheduling round trip on a relation
        // already in cache; values are identical, max over a tagged
        // union is max per branch)
        val (maxAsRight, maxAsLeft, presentConcats) =
          if (cands.length <= 1)
            (Map.empty[String, Long], Map.empty[String, Long],
              Set.empty[String])
          else {
            val ls = cands.map(_._1).distinct.toIndexedSeq
            val rs = cands.map(_._2).distinct.toIndexedSeq
            val concats = cands.map(c => c._1 + sep + c._2).distinct.toSeq
            val guards = pc.filter(col("r").isin(ls: _*))
                .select(lit("mr").as("t"), col("r").as("s"), col("n"))
              .unionAll(pc.filter(col("l").isin(rs: _*))
                .select(lit("ml").as("t"), col("l").as("s"), col("n")))
              .unionAll(pc
                .select(explode(array(col("l"), col("r"))).as("s"))
                .filter(col("s").isin(concats: _*))
                .select(lit("pr").as("t"), col("s"), lit(1L).as("n")))
              .groupBy(col("t"), col("s")).agg(max(col("n")).as("m"))
              .as[(String, String, Long)].collect()
            (guards.collect { case ("mr", s, m) => s -> m }.toMap,
              guards.collect { case ("ml", s, m) => s -> m }.toMap,
              guards.collect { case ("pr", s, _) => s }.toSet)
          }
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        val usedSyms = scala.collection.mutable.Set.empty[String]
        val usedConcats = scala.collection.mutable.Set.empty[String]
        var bound = Long.MinValue
        var collided = false
        var stop = false
        for (c @ (l, r, n) <- cands if !stop) {
          val disjoint = !usedSyms(l) && !usedSyms(r) &&
            !usedConcats(l) && !usedConcats(r)
          if (accepted.nonEmpty &&
              !(disjoint && !collided && n > bound && n >= minCount))
            stop = true
          else {
            accepted += c
            usedSyms += l; usedSyms += r
            // same-batch duplicate concat (char/byte level: (a,bc) and
            // (ab,c) both create "abc"; word level via ambiguous sep
            // joins): creation counts for the shared symbol ADD across
            // members while `bound` takes the max, so members AFTER the
            // duplicate could be committed out of sequential rank order
            // — end the batch at the duplicate, exactly like the
            // snapshot-presence case below. The duplicate member itself
            // is safe: at ITS sequential turn only the earlier creator
            // has fired, which `bound` covers.
            if (usedConcats(l + sep + r)) collided = true
            usedConcats += (l + sep + r)
            if (presentConcats(l + sep + r)) collided = true
            bound = math.max(bound,
              math.max(maxAsRight.getOrElse(l, 0L),
                maxAsLeft.getOrElse(r, 0L)))
          }
        }
        accepted.foreach { case (l, r, n) =>
          merges += ((idx, l, r, n)); idx += 1
        }
        // one fused kernel pass applies the whole batch in rank order
        // (identical to the one-at-a-time application: BpeOps.encodeAll
        // IS the sequential greedy pass per merge)
        syms = truncated(syms.select(
          BpeExprs.encode(col("s"),
            typedLit(accepted.map(_._1).toSeq),
            typedLit(accepted.map(_._2).toSeq), sep).as("s"),
          col("w")))
        pc.unpersist(false)
      }
    }
    merges.result()
      .toDF("merge_idx", "left", "right", "n_occurrences")
      .select(col("merge_idx").cast("long"), col("left"), col("right"),
        col("n_occurrences"))
  }

  /** Character-symbol initialization of one whitespace word, Sennrich
    * subword convention: the word's code-point characters, with the
    * end-of-word marker `eow` suffixed onto the FINAL character — so
    * word-final symbols are distinguishable from word-internal ones
    * and a learned vocabulary can reconstruct word boundaries.
    * Runs as the [[graft.functions.BpeOps.initSymbols]] byte-walk
    * kernel — output-identical (KernelFuzzSpec law) to the declarative
    * `array_remove(split(w, ""), "")` route it replaces (code-point
    * splits, surrogate pairs whole), matching char-indexed `substr`
    * replay in ANSI engines, at a fraction of the per-word-occurrence
    * cost in the encode hot path. */
  private[graft] def charInit(word: Column, eow: String): Column =
    BpeExprs.initSymbols(word, eow, byteLevel = false)

  /** CHAR-LEVEL (subword) BPE training — the Sennrich tokenizer a
    * production pipeline actually ships, vs [[bpeMerges]]' phrase
    * units: symbols start as the code-point characters of each
    * whitespace word with `eow` suffixed on the final character, and
    * merged symbols are plain concatenations (`sep = ""`), so the
    * learned table is a subword vocabulary ("t"+"h"→"th",
    * "th"+"e</w>"→"the</w>").
    *
    * Scale shape: training runs over the WORD-FREQUENCY DICTIONARY
    * (one `groupBy(word)` shuffle up front, then every trainer round's
    * pair count and kernel pass touch only Zipf-few distinct words,
    * weighted by multiplicity) — exactly Sennrich's formulation, and
    * provably equal to training on the raw occurrence stream because
    * symbol sequences are per-word (merges cannot cross word
    * boundaries, so identical words evolve identically and their pair
    * contributions just add). The batched rounds, creation-bound and
    * concat-collision guards of [[bpeTrain]] apply unchanged — at
    * char level concat collisions are routine ("a"+"b" = "ab" may
    * already exist), and the conservative batch stop keeps the table
    * sequential-exact.
    *
    * `minCount` is a weighted occurrence floor (pair occurrences
    * across the corpus, not distinct words). `sampleFraction` hash-
    * samples DOCUMENTS before the dictionary build, so `f` equals
    * pre-composing [[Corpus.sampleByHash]] (same law as [[bpeMerges]]).
    *
    * Output contract is identical to [[bpeMerges]]:
    * (merge_idx, left, right, n_occurrences). */
  def bpeMergesChar(df: DataFrame, textCol: Column, nMerges: Int,
      minCount: Long = 2L, eow: String = "</w>",
      sampleFraction: Double = 1.0, batchCap: Int = 32): DataFrame = {
    require(eow.nonEmpty, "bpeMergesChar: eow marker must be non-empty")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"bpeMergesChar: sampleFraction must be in (0,1], got $sampleFraction")
    val training =
      if (sampleFraction >= 1.0) df
      else Corpus.sampleByHash(df, textCol, sampleFraction)
    // no fan-out on the dictionary build: word explode + count is a
    // cheap pass whose single-task cost is below the repartition's
    // shuffle + 32-way small-task overhead (round-17 A/B: 0.26 s
    // single-task vs 0.41 s fanned at 32 cores, sf0.1)
    val dict = training.select(textCol.as("_t"))
      .select(explode(array_remove(split(col("_t"), "\\s+"), "")).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("w"))
      .select(charInit(col("_w"), eow).as("s"), col("w"))
    bpeTrain(dict, nMerges, minCount, sep = "", batchCap = batchCap)
  }

  /** Tokenize the corpus with a CHAR-LEVEL merge table trained by
    * [[bpeMergesChar]] — the subword encode: each whitespace word is
    * char-initialized (final char + `eow`) and the whole merge table
    * is applied per word in rank order via the doc-local
    * [[graft.functions.BpeEncodeExpr]] kernel inside a `transform`
    * lambda, then word encodings concatenate in document order.
    * Per-WORD application is the trainer's own unit (merges never
    * cross word boundaries), so encoding the training corpus
    * reproduces the trainer's final dictionary state without any
    * assumption that `eow` never occurs as literal text.
    *
    * Scale shape: the merge table rides the plan as two literal
    * arrays ([[collectMergeTable]] — bounded, cap-probed) and the
    * encode is doc-local — no shuffle, no join, not even a broadcast
    * exchange; `concat_ws("", bpe)` minus the markers reconstructs
    * the whitespace-normalized document.
    *
    * Output: (id, bpe array<string>, n_tokens). */
  /** Collect a rank-ordered merge table to the driver as two
    * rank-aligned symbol sequences — the LITERAL shape every encode
    * route bakes into its plan (two `typedlit` arrays: one stable
    * GenericArrayData per eval, so the rank-heap kernel's compiled-
    * table cache hits by reference identity on every word). Bounded
    * by the trainer's nMerges ≤ 10,000 contract: the fetch is ONE
    * `take(cap + 1)` — the driver materializes at most cap + 1 rows
    * by construction (a stronger form of the
    * [[graft.streaming.StreamOovMonitor]] probe-before-collect
    * discipline: a runaway merge relation fails loudly, bounded) —
    * with the rank sort done driver-side on the numeric merge_idx (no
    * global-sort exchange job for a bounded table, and no collation
    * concern on a long key). Collecting is EAGER: passing a
    * lazily-derived merges frame triggers its (bounded) evaluation at
    * operator-construction time. */
  private[graft] def collectMergeTable(merges: DataFrame,
      cap: Int = 100000): (Seq[String], Seq[String]) = {
    require(cap >= 1 && cap <= 1000000,
      s"collectMergeTable: cap must be in [1, 1e6], got $cap")
    val m = merges.select(col("merge_idx").cast("long").as("i"),
      col("left").cast("string").as("l"),
      col("right").cast("string").as("r"))
    val rows = m.take(cap + 1)
    require(rows.length <= cap,
      s"collectMergeTable: merge table exceeds the $cap cap " +
        "(bounded fetch hit cap + 1 rows)")
    // validate merge_idx before sorting: a null NPEs opaquely inside
    // Row.getLong, and duplicates would silently produce an arbitrary
    // rank alignment — both real hazards for a hand-built or corrupted
    // artifact loaded via loadBpeTokenizer
    require(rows.forall(!_.isNullAt(0)),
      "collectMergeTable: merge table has a null merge_idx — the " +
        "merges relation/artifact is corrupt (every rank must be a " +
        "non-null integer)")
    require(rows.iterator.map(_.getLong(0)).toSet.size == rows.length,
      "collectMergeTable: merge table has duplicate merge_idx values " +
        "— rank order is ambiguous; the merges relation/artifact is " +
        "corrupt (ranks must be distinct)")
    val sorted = rows.sortBy(_.getLong(0))
    (sorted.map(_.getString(1)).toSeq, sorted.map(_.getString(2)).toSeq)
  }

  def bpeEncodeChar(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, eow: String = "</w>"): DataFrame = {
    require(eow.nonEmpty, "bpeEncodeChar: eow marker must be non-empty")
    val (ls0, rs0) = collectMergeTable(merges)
    val ls = typedlit(ls0); val rs = typedlit(rs0)
    val words = array_remove(split(col("_t"), "\\s+"), "")
    Parallelism.fanOutScan(df.filter(textCol.isNotNull)
        .select(idCol.as("id"), textCol.as("_t")))
      .select(col("id"),
        flatten(transform(words, w =>
          BpeExprs.encode(charInit(w, eow), ls, rs, "")))
          .as("bpe"))
      .withColumn("n_tokens", size(col("bpe")).cast("long"))
  }

  /** BYTE-level symbol initialization of one whitespace word: the
    * word's UTF-8 BYTES as uppercase two-hex-digit symbols ("E2",
    * "82", …), with `eow` suffixed on the final byte — the GPT-2
    * byte-fallback convention re-expressed over a hex alphabet so
    * symbols stay plain strings (merged symbols concatenate hex
    * pairs; `unhex` of a symbol minus its marker recovers the bytes).
    * A base alphabet of ≤ 256 symbols means NO character can ever be
    * out-of-alphabet — the property byte-level tokenizers exist for —
    * and for pure-ASCII text the hex pairs are a bijection of the
    * code points, so byte- and char-level training learn isomorphic
    * tables (asserted in VocabSpec). Runs as the
    * [[graft.functions.BpeOps.initSymbols]] byte-walk kernel —
    * output-identical (KernelFuzzSpec law) to the declarative
    * `regexp_extract_all(hex(encode(w, "UTF-8")), "(..)", 1)` route it
    * replaces; that regex-per-word-occurrence was the measured
    * dominant constant of the byte-level encode (x120/x121). */
  private[graft] def byteInit(word: Column, eow: String): Column =
    BpeExprs.initSymbols(word, eow, byteLevel = true)

  /** BYTE-LEVEL BPE training — [[bpeMergesChar]] with the symbol
    * alphabet lowered from code points to UTF-8 bytes ([[byteInit]]).
    * Same weighted word-frequency-dictionary formulation, same batched
    * rounds, creation bound and concat-collision guards (fixed-width
    * hex symbols collide exactly like char symbols); same output
    * contract (merge_idx, left, right, n_occurrences). The trainer
    * loop is symbol-agnostic — this entry point is initialization
    * only, which is the whole point of byte fallback: the base
    * alphabet is bounded at 256+1 regardless of the corpus's Unicode
    * surface. */
  def bpeMergesByte(df: DataFrame, textCol: Column, nMerges: Int,
      minCount: Long = 2L, eow: String = "</w>",
      sampleFraction: Double = 1.0, batchCap: Int = 32): DataFrame = {
    require(eow.nonEmpty, "bpeMergesByte: eow marker must be non-empty")
    val training =
      if (sampleFraction >= 1.0) df
      else Corpus.sampleByHash(df, textCol, sampleFraction)
    // no fan-out on the dictionary build (see bpeMergesChar)
    val dict = training.select(textCol.as("_t"))
      .select(explode(array_remove(split(col("_t"), "\\s+"), "")).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("w"))
      .select(byteInit(col("_w"), eow).as("s"), col("w"))
    bpeTrain(dict, nMerges, minCount, sep = "", batchCap = batchCap)
  }

  /** Tokenize with a BYTE-LEVEL merge table from [[bpeMergesByte]] —
    * [[bpeEncodeChar]] over [[byteInit]] symbols: per-word greedy
    * rank-order application via the same doc-local kernel, merge
    * table as bounded plan literals, no shuffle, no join.
    * Output: (id, bpe array<string>, n_tokens); symbols are hex-pair
    * runs (+ `eow` on word-final symbols), so
    * `unhex(replace(sym, eow, ''))` recovers each token's bytes. */
  def bpeEncodeByte(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, eow: String = "</w>"): DataFrame = {
    require(eow.nonEmpty, "bpeEncodeByte: eow marker must be non-empty")
    val (ls0, rs0) = collectMergeTable(merges)
    val ls = typedlit(ls0); val rs = typedlit(rs0)
    val words = array_remove(split(col("_t"), "\\s+"), "")
    Parallelism.fanOutScan(df.filter(textCol.isNotNull)
        .select(idCol.as("id"), textCol.as("_t")))
      .select(col("id"),
        flatten(transform(words, w =>
          BpeExprs.encode(byteInit(w, eow), ls, rs, "")))
          .as("bpe"))
      .withColumn("n_tokens", size(col("bpe")).cast("long"))
  }

  /** Tokenize the corpus with a TRAINED merge table — the Sennrich
    * encode that turns [[bpeMerges]] from a statistic into a usable
    * tokenizer: whitespace symbols, then every merge applied in rank
    * order, each a greedy leftmost non-overlapping pass (identical to
    * the trainer's application step, so encoding the training corpus
    * reproduces the trainer's final symbol state — and BPE token counts
    * become the budget currency for [[Corpus.capTokensGlobal]]-style
    * operators instead of raw whitespace counts).
    *
    * Scale shape: the merge table rides the plan as two LITERAL
    * arrays (bounded by the nMerges ≤ 10000 vocabulary contract,
    * cap-probed by [[collectMergeTable]] — the x70 dictionary
    * pattern) and the whole encode is a doc-local codegen kernel
    * ([[graft.functions.BpeEncodeExpr]]) — no shuffle, no per-merge
    * projection chain (a 10k-merge table as 10k Catalyst projections
    * would be 10k plan nodes; the kernel is one).
    *
    * Output: (id, bpe array<string>, n_tokens). Merged symbols contain
    * `sep`, so `concat_ws(sep, bpe)` losslessly reconstructs the
    * whitespace-normalized document. */
  def bpeEncode(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, sep: String = " "): DataFrame = {
    val (ls0, rs0) = collectMergeTable(merges)
    Parallelism.fanOutScan(df.filter(textCol.isNotNull)
        .select(idCol.as("id"), textCol.as("_t")))
      .select(col("id"),
        BpeExprs.encode(array_remove(split(col("_t"), "\\s+"), ""),
          typedlit(ls0), typedlit(rs0), sep).as("bpe"))
      .withColumn("n_tokens", size(col("bpe")).cast("long"))
  }

  /** Per-group OOV (out-of-vocabulary) rate against a FROZEN
    * vocabulary relation — the tokenizer-coverage diagnostic (which
    * corpus slices a vocab serves worst), in ONE corpus pass.
    *
    * Scale shape: the vocabulary aggregates into a single sorted-array
    * row (bounded by the vocab-size contract — the x91 merge-table
    * broadcast pattern) and rides a broadcast; each document then
    * answers "how many of my token occurrences are in-vocab" with the
    * doc-local [[graft.functions.SortedContainsCount]] merge kernel —
    * the corpus is scanned ONCE, the exploded token stream is never
    * materialized, and the only shuffle carries one tiny
    * (group, n_tokens, n_in) row per group (map-side combined). The
    * naive route (explode → left_anti join → two aggregates) scans the
    * corpus twice and shuffles every token occurrence.
    *
    * Groups whose documents carry no tokens are absent (no rate is
    * defined), matching the exploded route's semantics.
    *
    * Output: (`source`, n_oov, n_tokens, oov_rate). */
  def oovRate(docs: DataFrame, vocab: DataFrame,
      srcColName: String = "source", textCol: String = "text",
      tokenCol: String = "token"): DataFrame = {
    val vrow = vocab.agg(sort_array(collect_set(col(tokenCol))).as("_v"))
    val tk = sort_array(array_remove(split(col(textCol), "\\s+"), ""))
    docs.crossJoin(broadcast(vrow))
      .select(col(srcColName).as("source"),
        size(tk).cast("long").as("_nt"),
        graft.functions.SetExprs.sortedContainsCount(tk, col("_v"))
          .cast("long").as("_nin"))
      .groupBy(col("source"))
      .agg(sum(col("_nt")).as("n_tokens"),
        sum(col("_nt") - col("_nin")).as("n_oov"))
      .filter(col("n_tokens") > 0)
      .select(col("source"), col("n_oov"), col("n_tokens"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** [[bpeEncode]] to INT token ids — the representation a training
    * pipeline actually ships (token-id arrays, not symbol strings):
    * ids are DEFINED as the 1-based rank of each symbol in the encoded
    * corpus's sorted symbol universe, so the mapping is a deterministic
    * pure function of the corpus + merge table (reproducible anywhere,
    * SQL-replayable). Symbols outside the universe — possible only
    * when encoding NEW text against a frozen vocabulary — map to -1
    * (the UNK id).
    *
    * Scale shape: the symbol universe is bounded (base whitespace
    * vocabulary shrunk by merges, plus ≤ nMerges merged symbols) and
    * rides ONE sorted broadcast row; id assignment is the doc-local
    * [[graft.functions.SortedLookupIds]] binary-search kernel — no
    * token-stream explode, no join, O(len · log V) per doc. The
    * universe is collected EAGERLY at call time (engine sort order, so
    * the driver never re-sorts with JVM collation) and the output plan
    * re-derives the encode — two doc-local kernel passes total, and
    * the operator leaves NO persisted relation behind (the
    * cache-lifecycle discipline of `connectedComponentsDelta`).
    *
    * Output: (id, ids array<int>, n_tokens). */
  def bpeEncodeIds(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, sep: String = " "): DataFrame =
    idsFromEncoded(bpeEncode(df, idCol, textCol, merges, sep))

  /** [[bpeEncodeChar]] to INT token ids — the char-level twin of
    * [[bpeEncodeIds]] with the identical id contract (1-based rank in
    * the encoded corpus's sorted symbol universe, UNK = -1).
    *
    * Scale shape — BETTER than the word-level route's two corpus
    * passes: char-level words encode independently, so the encoded
    * corpus's symbol universe equals the universe of the encoded
    * DISTINCT-WORD dictionary (every corpus word is a dictionary
    * entry). The universe pass therefore runs over Zipf-few distinct
    * words (the [[bpeMergesChar]] training discipline) and the corpus
    * itself is encoded exactly ONCE, at output materialization. No
    * persisted relation is left behind. Output: (id, ids, n_tokens). */
  def bpeEncodeIdsChar(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, eow: String = "</w>"): DataFrame = {
    require(eow.nonEmpty, "bpeEncodeIdsChar: eow marker must be non-empty")
    encodeIdsViaDict(df, idCol, textCol, merges, eow,
      charInit, bpeEncodeChar)
  }

  /** [[bpeEncodeByte]] to INT token ids — the byte-level twin of
    * [[bpeEncodeIdsChar]] with the identical id contract and the
    * identical dictionary-universe scale shape (byte-level words also
    * encode independently, so the encoded distinct-word dictionary's
    * symbol universe equals the corpus universe — one universe pass
    * over Zipf-few words, one corpus encode at materialization, no
    * persisted relation left behind). Output: (id, ids, n_tokens). */
  def bpeEncodeIdsByte(df: DataFrame, idCol: Column, textCol: Column,
      merges: DataFrame, eow: String = "</w>"): DataFrame = {
    require(eow.nonEmpty, "bpeEncodeIdsByte: eow marker must be non-empty")
    encodeIdsViaDict(df, idCol, textCol, merges, eow,
      byteInit, bpeEncodeByte)
  }

  /** Shared dictionary-universe ids route (char/byte level): build the
    * sorted symbol universe from the encoded DISTINCT-WORD dictionary
    * (valid because per-word encoding is independent of surrounding
    * words), then assign ids with the doc-local binary-search kernel
    * over ONE corpus encode. */
  private def encodeIdsViaDict(df: DataFrame, idCol: Column,
      textCol: Column, merges: DataFrame, eow: String,
      init: (Column, String) => Column,
      enc: (DataFrame, Column, Column, DataFrame, String) => DataFrame)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (ls0, rs0) = collectMergeTable(merges)
    // no fan-out on the universe pass: the encode runs over Zipf-few
    // DISTINCT words, which measured 2.2× faster without the
    // repartition at 32 cores (0.17 s vs 0.36 s, round-17 A/B) — the
    // corpus-sized encode below keeps its fan-out
    val dictEnc = df.select(textCol.as("_t"))
      .select(explode(array_remove(split(col("_t"), "\\s+"), "")).as("_w"))
      .distinct()
      .select(BpeExprs.encode(init(col("_w"), eow),
        typedlit(ls0), typedlit(rs0), "").as("bpe"))
    // explode_OUTER + isNotNull, not plain explode: InferFiltersFromGenerate
    // turns explode(bpe) into a `size(bpe) > 0` pre-filter, and with a
    // fully-literal merge table the encode expression is substitutable all
    // the way down — the optimizer pushes the HEAVY encode below the
    // distinct, re-evaluating it per word OCCURRENCE (measured 8× on this
    // pass). Inference skips outer generates, and the isNotNull on the
    // generate OUTPUT cannot push below it.
    val vocabArr = dictEnc.select(explode_outer(col("bpe")).as("t"))
      .filter(col("t").isNotNull).distinct()
      .orderBy(col("t")).as[String].collect().toSeq
    val vdf = Seq(Tuple1(vocabArr)).toDF("_v")
    enc(df, idCol, textCol, merges, eow)
      .crossJoin(broadcast(vdf))
      .select(col("id"),
        graft.functions.SetExprs.sortedLookupIds(col("bpe"), col("_v"))
          .as("ids"),
        col("n_tokens"))
  }

  /** Decode token-id arrays back to symbol arrays against a sorted
    * vocabulary array column (the [[bpeEncodeIds]] universe): id i ↦
    * vocab[i] (1-based), UNK (−1) ↦ null. The inverse of the id
    * mapping — `decode ∘ encode = identity` on in-vocab corpora (the
    * VocabSpec round-trip law) — as a doc-local projection for
    * inspection/debug tooling over shipped id arrays. */
  def bpeDecodeIds(ids: Column, sortedVocab: Column): Column =
    transform(ids, i =>
      when(i >= 1 && i <= size(sortedVocab), element_at(sortedVocab, i)))

  // ---- tokenizer artifact persistence ----------------------------------

  /** A frozen tokenizer artifact loaded from disk: the rank-ordered
    * merge table plus the metadata needed to apply it correctly —
    * `level` ("word" | "char" | "byte", i.e. which symbol init the
    * table was trained over) and `marker` (the end-of-word marker for
    * char/byte tables, the separator for word tables). */
  final case class BpeArtifact(merges: DataFrame, level: String,
      marker: String)

  private val BpeArtifactVersion = 1
  private val BpeLevels = Set("word", "char", "byte")

  /** Persist a trained merge table as a versioned on-disk tokenizer —
    * what a production pipeline actually ships between the offline
    * trainer and every consumer (batch encode jobs,
    * [[graft.streaming.StreamBpeTokenize]] ingestion, other clusters):
    * `<path>/merges` holds the (merge_idx, left, right, n_occurrences)
    * table as parquet, `<path>/meta` one row of
    * (version, level, marker, n_merges). The merge table is bounded by
    * the trainer's vocabulary contract, so both writes are small; the
    * n_merges stamp lets [[loadBpeTokenizer]] verify the table read
    * back complete. Overwrites any artifact already at `path`. */
  def saveBpeTokenizer(merges: DataFrame, path: String, level: String,
      marker: String): Unit = {
    require(BpeLevels.contains(level),
      s"saveBpeTokenizer: level must be one of $BpeLevels, got '$level'")
    require(level == "word" || marker.nonEmpty,
      "saveBpeTokenizer: char/byte artifacts need a non-empty marker")
    val spark = merges.sparkSession
    import spark.implicits._
    // bounded collect (cap-probed) both validates the table's shape and
    // pins the row count for the completeness stamp
    val (ls, rs) = collectMergeTable(merges)
    val n = ls.size
    merges.select(col("merge_idx").cast("long"),
      col("left").cast("string"), col("right").cast("string"),
      col("n_occurrences").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges")
    Seq((BpeArtifactVersion, level, marker, n.toLong))
      .toDF("version", "level", "marker", "n_merges")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[saveBpeTokenizer]] artifact, verifying the version and
    * the completeness stamp. The load-path equality contract (the
    * VocabSpec gate): `bpeEncodeIds*` from a loaded artifact equals
    * the same call on the freshly-trained table, byte for byte. */
  def loadBpeTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeArtifact = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"loadBpeTokenizer: expected 1 meta row at $path/meta, got ${meta.length}")
    val m = meta(0)
    val version = m.getAs[Int]("version")
    require(version == BpeArtifactVersion,
      s"loadBpeTokenizer: unsupported artifact version $version " +
        s"(this build reads $BpeArtifactVersion)")
    val level = m.getAs[String]("level")
    val marker = m.getAs[String]("marker")
    require(BpeLevels.contains(level),
      s"loadBpeTokenizer: corrupt artifact — unknown level '$level'")
    val merges = spark.read.parquet(s"$path/merges")
    val n = merges.count()
    require(n == m.getAs[Long]("n_merges"),
      s"loadBpeTokenizer: table has $n rows, stamp says " +
        s"${m.getAs[Long]("n_merges")} — incomplete or mixed artifact")
    BpeArtifact(merges, level, marker)
  }

  private def idsFromEncoded(enc: DataFrame): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    // explode_outer + isNotNull: see encodeIdsViaDict — keeps the
    // optimizer from pushing the encode below as an inferred pre-filter
    val vocabArr = enc.select(explode_outer(col("bpe")).as("t"))
      .filter(col("t").isNotNull).distinct()
      .orderBy(col("t")).as[String].collect().toSeq
    val vdf = Seq(Tuple1(vocabArr)).toDF("_v")
    enc.crossJoin(broadcast(vdf))
      .select(col("id"),
        graft.functions.SetExprs.sortedLookupIds(col("bpe"), col("_v"))
          .as("ids"),
        col("n_tokens"))
  }

  /** [[oovRate]]'s UNBOUNDED-vocabulary route: when the vocabulary
    * cannot ride a broadcast row (an open token universe past the
    * broadcast budget), the token stream explodes and anti-joins the
    * vocab relation on the token key — gram-keyed shuffle of token
    * occurrences, the same large-side trade [[graft.operators.Dedup]]
    * makes for x33's over-budget benchmarks. Output contract is
    * IDENTICAL to [[oovRate]] (the x116 gate proves the two routes
    * hash-equal); prefer the kernel route whenever the vocab fits. */
  def oovRateJoined(docs: DataFrame, vocab: DataFrame,
      srcColName: String = "source", textCol: String = "text",
      tokenCol: String = "token"): DataFrame = {
    val toks = docs.select(col(srcColName).as("source"),
      explode(array_remove(split(col(textCol), "\\s+"), "")).as("token"))
    val v = vocab.select(col(tokenCol).cast("string").as("token"))
      .filter(col("token").isNotNull).distinct()
    val tot = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"))
    val oov = toks.join(v, Seq("token"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_oov"))
    tot.join(oov, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"), col("n_tokens"),
        (coalesce(col("n_oov"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Collocation mining: top-k adjacent-token pairs by LIFT — the
    * observed bigram frequency over its expectation under unigram
    * independence, n_ab·N / (n_a·n_b). The log of this is PMI; the
    * raw ratio ranks identically (log is monotone) while staying
    * bit-reproducible across engines (products and one division are
    * exactly-rounded IEEE ops; log is libm-dependent). `minCount`
    * suppresses the classic PMI pathology of rare-pair dominance.
    *
    * Scale shape: bigram and unigram counts are map-side-combinable
    * aggregates; the count filter runs BEFORE the unigram joins, so
    * only surviving pair types join; the total-token scalar attaches
    * by a constant-key broadcast; TakeOrdered pushes k into every
    * partition under the deterministic (lift desc, t1, t2) order.
    *
    * Output: (t1, t2, n_ab, lift). */
  def bigramLift(df: DataFrame, textCol: Column, minCount: Int = 5,
      k: Int = 50): DataFrame = {
    require(minCount >= 1, s"bigramLift: minCount must be >= 1, got $minCount")
    require(k > 0, s"bigramLift: k must be > 0, got $k")
    val bc = bigramCounts(df, textCol)
      .withColumnRenamed("n_occurrences", "n_ab")
      .filter(col("n_ab") >= minCount)
    val uc = tokenCounts(df, textCol)
    val tot = tokens(df, textCol).agg(count(lit(1)).as("total"))
      .withColumn("_k", lit(1))
    bc.join(uc.select(col("token").as("t1"),
        col("n_occurrences").as("_na")), "t1")
      .join(uc.select(col("token").as("t2"),
        col("n_occurrences").as("_nb")), "t2")
      .withColumn("_k", lit(1))
      .join(broadcast(tot), "_k")
      .select(col("t1"), col("t2"), col("n_ab"),
        (col("n_ab").cast("double") * col("total").cast("double") /
          (col("_na").cast("double") * col("_nb").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("t1"), col("t2"))
      .limit(k)
  }

  /** Per-document bigram coverage: what fraction of a document's
    * adjacent-token bigram occurrences belong to bigram types seen in
    * at least `minDf` distinct documents corpus-wide. A lightweight
    * n-gram-LM quality gate — prose scores high, shredded/garbled text
    * scores low — whose value is exact (integer counts + one IEEE
    * division), unlike log-probability scores whose libm dependence is
    * not bit-reproducible across engines.
    *
    * Scale shape: the document-frequency aggregate is two map-side-
    * combinable stages over (bigram, doc) then bigram; the coverage
    * join shuffles bigram keys (the corpus's bigram type universe —
    * the same contract as [[tokenCounts]]; route through
    * [[heavyHitters]] when only frequent types matter), then one keyed
    * aggregate per doc. Docs with fewer than two tokens surface with
    * zero counts and a null coverage.
    *
    * Output: (idCol, n_bigrams, n_known, coverage). */
  def bigramCoverage(df: DataFrame, textCol: Column, minDf: Int = 2,
      idCol: String = "doc_id"): DataFrame = {
    require(minDf >= 1, s"bigramCoverage: minDf must be >= 1, got $minDf")
    val tk = array_remove(split(textCol, "\\s+"), "")
    val pairs = df.select(col(idCol), explode(when(size(tk) >= 2,
        zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => struct(a.as("t1"), b.as("t2"))))
      .otherwise(array().cast("array<struct<t1:string,t2:string>>")))
      .as("p"))
      .select(col(idCol), col("p.t1").as("t1"), col("p.t2").as("t2"))
    val dfreq = pairs.groupBy(col("t1"), col("t2"))
      .agg(countDistinct(col(idCol)).as("_df"))
    val per = pairs.join(dfreq, Seq("t1", "t2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("_df") >= minDf, 1L).otherwise(0L)).as("n_known"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          coalesce(col("n_known"), lit(0L)).cast("double") /
            col("n_bigrams").cast("double"))
          .as("coverage"))
  }

  /** Zipf-law fit per language: least-squares slope of
    * ln(freq) ~ ln(rank) over each language's `topK` most frequent
    * tokens (rank ties broken token-ascending). Natural-language text
    * sits near −1; a corpus slice drifting far off (machine-generated
    * boilerplate ≈ flat head, template spam ≈ cliff) is the classic
    * cheap distribution-shift alarm for ingest QA.
    *
    * Scale shape: token frequencies are one map-combinable aggregate;
    * ranking is [[graft.operators.GroupedRank.rankInGroup]] — range-
    * partitioned parallel sorts plus a bounded driver offset table,
    * never a one-task-per-language window — and the fit reduces over
    * ≤ topK rows per language with closed-form `covar_pop/var_pop`
    * (no iterative solver). The tail past topK (where Zipf breaks
    * down anyway) is never sorted further or carried.
    *
    * Output: (lang, zipf_slope 6-dp — null when a language has one
    * distinct token, n_types ≤ topK, n_tokens = occurrences covered
    * by those types). */
  def zipfSlope(docs: DataFrame, topK: Int = 1000,
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(topK >= 2, s"zipfSlope: topK must be >= 2, got $topK")
    val tf = docs
      .select(col(langCol),
        explode(array_remove(split(col(textCol), "\\s+"), "")).as("token"))
      .groupBy(col(langCol), col("token"))
      .agg(count(lit(1)).as("freq"))
    val ranked = GroupedRank.rankInGroup(
        tf, col(langCol), Seq(col("freq").desc, col("token").asc), "rank")
      .filter(col("rank") <= topK)
    val lx = log(col("rank"))
    ranked.groupBy(col(langCol))
      .agg(
        round(when(var_pop(lx) > 0d,
          covar_pop(log(col("freq")), lx) / var_pop(lx)), 6)
          .as("zipf_slope"),
        count(lit(1)).as("n_types"),
        sum(col("freq")).as("n_tokens"))
  }
}
