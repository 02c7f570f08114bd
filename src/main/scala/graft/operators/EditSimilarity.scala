package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.ShingleExprs

/** Edit-distance (Levenshtein) similarity self-join.
  *
  * Reference scope: the reference engine has no string-similarity join at
  * all; this extends the dedup family (exact / MinHash / SimHash /
  * n-gram Jaccard) with the bounded-edit-distance pair search a curation
  * pipeline uses for near-identical variant detection (OCR noise,
  * template drift, single-field edits).
  *
  * Plan shape (Ed-Join-style q-gram prefix filter):
  *
  *  1. Per doc, one codegen projection computes the sorted distinct
  *     q-gram hash set ([[graft.functions.ShingleSetCharsExpr]] — no
  *     explode, no shuffle). Ascending hash value is the global total
  *     order used for prefix filtering; it needs no frequency
  *     dictionary, so candidate generation is a single self-join.
  *  2. Pigeonhole: one edit destroys at most `q` gram occurrences, so
  *     docs within distance `maxDist` share all but ≤ q·maxDist distinct
  *     grams. By the prefix-filter theorem the first `q·maxDist + 1`
  *     grams (in the shared total order) of the two docs must intersect
  *     whenever at least one side has more than q·maxDist grams.
  *     Candidates = equality join on exploded prefix grams, with the
  *     |len(a) − len(b)| ≤ maxDist length filter fused into the join
  *     condition — never a cartesian.
  *  3. Short-string pool: docs with ≤ q·maxDist grams (or shorter than
  *     q chars) get no prefix guarantee among THEMSELVES, so they also
  *     pair within a length-granule bucket join (width maxDist+1, probe
  *     +1) — key-equality, bounded by the pool's length band. Pairs of
  *     one short and one long doc are already covered by the prefix
  *     route (slice keeps all grams of the short side).
  *  4. Verify: banded `levenshtein(a, b, maxDist)` (O(len·maxDist), not
  *     O(len²)) on the distinct candidate pairs only.
  *
  * 100 TB: every join is key-equality (gram hash / length bucket);
  * candidates ∝ near-duplicate pairs + hash-order prefix collisions.
  * Hash order spreads frequent grams uniformly across prefixes — on
  * heavily templated natural text a frequency-ranked order (rare grams
  * first, as in the x4 PPJoin dictionary) cuts candidates further; see
  * SCALE.md. The short pool degenerates toward banded all-pairs only
  * when maxDist is large relative to the string length — a regime where
  * "within maxDist edits" is itself near-vacuous.
  */
object EditSimilarity {

  /** All unordered pairs with Levenshtein distance ≤ `maxDist`.
    * Output: (a_id, b_id, dist) with a_id < b_id, dist ≤ maxDist. */
  def editDistancePairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDist: Int = 20, q: Int = 4): DataFrame = {
    require(maxDist >= 0, s"editDistancePairs: maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"editDistancePairs: q must be >= 2, got $q")
    val prefixLen = q * maxDist + 1

    val g = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("t"),
        length(col(textCol)).as("len"),
        ShingleExprs.shingleSetChars(col(textCol), q).as("ng"))
      .withColumn("n_grams", coalesce(size(col("ng")), lit(0)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // route 1: prefix-gram equality join (sound for every pair where at
    // least one side has > q·maxDist grams)
    val pre = g.filter(col("ng").isNotNull)
      .select(col("id"), col("len"),
        explode(slice(col("ng"), 1, prefixLen)).as("gram"))
    val prefixCands = pre.as("a").join(pre.as("b"),
      col("a.gram") === col("b.gram") &&
        col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    // route 2: both-short pairs via length-granule buckets (width
    // maxDist+1 ⇒ |len diff| ≤ maxDist implies bucket diff ≤ 1; the
    // +1 probe key on one side covers the off-by-one bucket)
    val short = g.filter(col("ng").isNull || col("n_grams") <= q * maxDist)
      .select(col("id"), col("len"),
        (col("len").cast("long") / (maxDist + 1)).cast("long").as("bkt"))
    val probe = short.select(col("id"), col("len"),
      explode(array(col("bkt"), col("bkt") + 1)).as("k"))
    val shortCands = probe.as("a").join(short.as("b"),
      col("a.k") === col("b.bkt") &&
        col("a.id") =!= col("b.id") &&
        abs(col("a.len") - col("b.len")) <= maxDist)
      .select(least(col("a.id"), col("b.id")).as("a_id"),
        greatest(col("a.id"), col("b.id")).as("b_id"))

    // distinct candidate pairs, then one banded-verify pass
    val cands = prefixCands.union(shortCands).distinct()
    val txt = g.select(col("id"), col("t"))
    cands
      .join(txt.withColumnRenamed("id", "a_id").withColumnRenamed("t", "ta"), "a_id")
      .join(txt.withColumnRenamed("id", "b_id").withColumnRenamed("t", "tb"), "b_id")
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
