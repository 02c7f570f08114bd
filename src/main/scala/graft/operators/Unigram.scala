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
    docs.filter(textCol.isNotNull)
      .select(explode(words(textCol)).as("w"))
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
    * (0 = `[UNK]`): output (`id`, `ids`, `n_tokens`). */
  def wordpieceBertEncodeIds(docs: DataFrame, idCol: Column,
      textCol: Column, vocab: DataFrame): DataFrame = {
    val (ps, fs) = collectVocab(vocab)
    val pl = typedlit(ps); val fl = typedlit(fs)
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        flatten(transform(words(textCol),
          w => UnigramExprs.wordpieceBertIds(w, pl, fl))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
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
