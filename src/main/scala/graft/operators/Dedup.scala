package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{SetExprs, ShingleExprs}

/** Document deduplication operators, each stated in partition-scalable
  * form: no driver collects, no O(n²) cross joins — candidate generation
  * is always a key-equality shuffle (exact hash, LSH band, SimHash chunk,
  * or a blocking key), and only candidates pay the verification cost.
  *
  * Algorithms (public literature): MinHash resemblance sketching
  * [Broder, "On the resemblance and containment of documents", 1997];
  * banded LSH [Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
  * ch. 3]; SimHash [Charikar, "Similarity estimation techniques from
  * rounding algorithms", 2002] with the chunk-pigeonhole search of
  * [Manku/Jain/Sarma, "Detecting near-duplicates for web crawling",
  * 2007]; prefix-filtering set-similarity join [Chaudhuri/Ganti/Kaushik,
  * "A primitive operator for similarity joins", 2006; Xiao et al.,
  * "Efficient similarity joins for near duplicate detection", 2008].
  */
object Dedup {

  /** Exact dedup: group identical (normalized) texts, keep the smallest id.
    * One hash aggregate keyed on the 16-byte MD5 of the normalized text —
    * fixed-width shuffle keys instead of document-length strings, with
    * collision probability ~2⁻¹²⁸ (no corpus reaches the ~2⁶⁴ texts where
    * that matters). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(unhex(md5(lower(trim(col(textCol))))).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  // ---- MinHash + LSH --------------------------------------------------

  /** Number of minhash permutations / LSH layout (16 bands × 4 rows
    * targets ~0.5 Jaccard). */
  val MinhashPerms = 64
  val Bands = 16
  private val RowsPerBand = MinhashPerms / Bands

  /** (band, bandHash) pairs for a signature — the LSH bucketing key.
    * xxhash64 (not 32-bit murmur3) keeps band-collision false positives
    * at ~2⁻⁶⁴ per comparison, negligible at corpus scale. */
  private def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))).as("bh")))

  /** MinHash signatures as one projection pass — the signature is a
    * document-local computation (see [[graft.functions.MinHashSigExpr]]),
    * so no explode and no shuffle: at corpus scale the explode→aggregate
    * formulation shuffles ~15× the corpus size just to regroup shingles
    * by the document they came from. Docs shorter than the shingle
    * length are dropped (no signature). */
  def minhashSignatures(docs: DataFrame, shingleLen: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      ShingleExprs.minhashSignature(col(textCol), shingleLen).as("sig"))
      .filter(col("sig").isNotNull)

  /** Near-duplicate pairs via MinHash LSH, verified with shingle-set
    * Jaccard over hashed shingles. Flow: ONE shuffle-free projection
    * computes the signature (64 permutation mins) and the sorted distinct
    * hashed-shingle set per doc → explode 16 band keys → self-join on
    * (band, bandHash) → distinct candidate pairs → merge-intersect
    * Jaccard verify from the same persisted relation. The self-join is a
    * key-equality shuffle on the band hash; the corpus is never paired
    * quadratically.
    *
    * The per-doc relation is persisted: four join branches reference it
    * (two band sides, two verify sides) and Spark recomputes non-cached
    * lineage per branch — at scale you would likewise materialize
    * signatures before banding. Jaccard over 64-bit-hashed shingles
    * (xxhash64, see [[graft.functions.ShingleOps.shingleSet]]) equals
    * true Jaccard up to vanishing collision probability (~|union|²/2⁶⁴
    * per pair), and sorted-long-array merge intersection is far cheaper
    * than string-array hash intersection. */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
      shingleLen: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      ShingleExprs.minhashSignature(col(textCol), shingleLen).as("sig"),
      ShingleExprs.shingleSet(col(textCol), shingleLen).as("ng"))
      .filter(col("sig").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val bands = base.select(col("id"), explode(bandKeys(col("sig"))).as("k"))
      .select(col("id"), col("k.band").as("band"), col("k.bh").as("bh"))

    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .distinct()

    val withSets = candidates
      .join(base.select(col("id"), col("ng").as("ng_a")),
        col("doc_a") === col("id")).drop("id")
      .join(base.select(col("id"), col("ng").as("ng_b")),
        col("doc_b") === col("id")).drop("id")

    jaccardVerify(withSets, threshold)
  }

  /** Blocked n-gram Jaccard as a prefix-filtering set-similarity join
    * (SSJoin): within each block, candidate pairs must share a gram in
    * a rare-first prefix — lossless for Jaccard ≥ t under a global
    * token order — plus mutual size bounds (J(A,B) ≤ min|·|/max|·|).
    *
    * The whole join runs on 64-bit gram hashes. The per-doc sorted
    * distinct gram-hash set is ONE doc-local kernel pass (see
    * [[graft.functions.ShingleSetCharsExpr]]) — no gram explode, no
    * collect_set shuffle of string grams: the only full-width shuffles
    * left are the doc-frequency count and the per-doc rank window, both
    * over 8-byte hashes. Jaccard over hashed sets equals string-gram
    * Jaccard unless xxhash64 collides inside a pair's union (probability
    * ≈ |union|²/2⁶⁴ — vanishing at any realistic scale; in practice the
    * result equals the brute-force within-block pairwise join, which is
    * what the DuckDB oracle computes), and the quadratic pair space is
    * replaced by a key-equality join on rare prefix grams: every stage
    * is a shuffle on a key, nothing is O(block²). */
  def ngramJaccardBlocked(docs: DataFrame, blockCol: String,
      threshold: Double = 0.5, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        ShingleExprs.shingleSetChars(col(textCol), n).as("ng"))
      .filter(col("ng").isNotNull)
      .withColumn("sz", size(col("ng")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val toks = g.select(col("id"), col("blk"), col("sz"),
      explode(col("ng")).as("gram"))
    // rare-first order: document frequency per (block, gram), joined
    // back onto the token stream. No forced broadcast hint — the gram
    // universe is bounded per block (≤ charset^n) but gramDf grows with
    // the NUMBER of blocks, so a mandatory broadcast would OOM on a
    // many-block corpus; AQE sees the aggregate's true runtime size and
    // broadcasts exactly when it fits. toks derives from the persisted
    // g, so the two references cost two cache reads, not two
    // token-table builds.
    val gramDf = toks.groupBy(col("blk"), col("gram"))
      .agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("id")).orderBy(col("df"), col("gram"))
    // asymmetric prefixes (PPJoin, Xiao et al. 2008 Lemma 2): for a
    // qualifying pair with |a| ≤ |b|, the SMALLER doc's indexing prefix
    // sz−⌈(2t/(1+t))·sz⌉+1 and the LARGER doc's probing prefix
    // sz−⌈t·sz⌉+1 must share a gram — so the join restricts the a-side
    // (smaller) to its indexing prefix and leaves the b-side (larger) on
    // its full probing prefix, shrinking the pair space with no loss.
    // (Restricting b instead is NOT sound: the guarantee is one-sided.)
    //
    // All bounds are computed in EXACT decimal arithmetic on a
    // threshold nudged down by 1e-12. Double arithmetic here silently
    // shortens prefixes for thresholds that aren't FP-exact — e.g.
    // floor((1.0−0.8)·5)+1 = 1 instead of 2, dropping a J=4/5 pair at
    // t=0.8 — and the 1e-12 slack additionally covers pairs whose real
    // Jaccard sits within one double-rounding ulp below the threshold
    // yet passes the final double comparison. The slack only ever
    // lengthens prefixes (a handful of extra candidates, never a miss).
    val tLow = BigDecimal.valueOf(threshold) - BigDecimal("1e-12")
    // fixed scale 15, rounded DOWN: keeps the Spark-side decimal
    // multiply within exact precision (scale 15 + int32 < 38 digits)
    // and any rounding only lengthens the prefix (still conservative)
    val ixLow = (tLow * 2 / (1 + tLow))
      .setScale(15, scala.math.BigDecimal.RoundingMode.FLOOR)
    // prefix length sz−⌈f·sz⌉+1 ⇔ rn ≤ sz−⌈f·sz⌉+1; Spark decimal
    // multiply + ceil are exact, so the bound is the true integer one
    def prefLen(f: BigDecimal): Column =
      col("sz") - ceil(lit(f) * col("sz")) + 1
    val prefix = toks
      .join(gramDf, Seq("blk", "gram"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= prefLen(tLow))
      .withColumn("ixp", col("rn") <= prefLen(ixLow))
      .select(col("id"), col("blk"), col("gram"), col("sz"), col("rn"),
        col("ixp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // positional filter (PPJoin Lemma 3): all shared grams of a pair sit
    // at ranks ≥ the matched gram's rank in BOTH docs (global rare-first
    // order), so overlap ≤ 1 + min(szA−pa, szB−pb); a qualifying pair
    // needs overlap ≥ α = ⌈t/(1+t)·(szA+szB)⌉ and is kept via its FIRST
    // shared prefix gram, where the bound is loosest. Prunes most of the
    // per-gram pair space before the distinct.
    val alphaFrac = (tLow / (1 + tLow))
      .setScale(15, scala.math.BigDecimal.RoundingMode.FLOOR)
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.blk") === col("b.blk") && col("a.gram") === col("b.gram") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.id") < col("b.id"))) &&
          col("a.ixp") &&
          col("a.sz") >= ceil(lit(tLow) * col("b.sz")) &&
          lit(1) + least(col("a.sz") - col("a.rn"),
            col("b.sz") - col("b.rn")) >=
            ceil(lit(alphaFrac) * (col("a.sz") + col("b.sz"))))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"))
      .distinct()
    // verify: merge-intersect Jaccard over the same persisted hashed
    // sets — the sorted-long-array merge is the cheapest exact check
    // available, and no second per-doc aggregation is needed
    val withSets = candidates
      .join(g.select(col("id"), col("ng").as("ng_a")),
        col("doc_a") === col("id")).drop("id")
      .join(g.select(col("id"), col("ng").as("ng_b")),
        col("doc_b") === col("id")).drop("id")
    jaccardVerify(withSets, threshold)
  }

  /** Exact Jaccard over pre-sorted ngram-set columns `ng_a`/`ng_b` via a
    * codegen'd linear merge. The threshold test is fused into the
    * expression ([[graft.functions.JaccardGE]]): a separate
    * `filter(jaccard >= t)` gets inlined by predicate pushdown into the
    * preceding join condition and re-evaluated in the output projection
    * — three merge passes per candidate pair; the fused form pays one
    * per candidate plus one per surviving pair. */
  private def jaccardVerify(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard",
        SetExprs.jaccardGE(col("ng_a"), col("ng_b"), threshold))
      .filter(col("jaccard").isNotNull)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash per document — a document-local kernel (one
    * projection pass, no explode/shuffle; see
    * [[graft.functions.SimHash64]]). */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      ShingleExprs.simhash64(lower(col(textCol))).as("simhash"))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming, found by
    * chunk banding (pigeonhole: distance ≤ 3 ⇒ one of the four 16-bit
    * chunks is equal), then verified with bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val chunks = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))
            .as("ck"))): _*)).as("k"))
      .select(col("id"), col("simhash"), col("k.chunk").as("chunk"),
        col("k.ck").as("ck"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
