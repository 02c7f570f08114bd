package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EditSimilarity}

/** Incremental (delta) routes x86/x87: a new batch probes a PERSISTED
  * corpus index — SimHash fingerprints, edit-distance gram/prefix
  * relations — and must reproduce the full recompute restricted to
  * pairs touching the delta. Both indexes round-trip through parquet so
  * the tests prove index sufficiency structurally: after read-back the
  * corpus side has no lineage to its source text at all (x86) or only
  * the persisted columns the contract names (x87).
  */
class DeltaDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def split(docs: DataFrame): (DataFrame, DataFrame) =
    (docs.filter(col("doc_id") % 7 === 0),
      docs.filter(col("doc_id") % 7 =!= 0))

  private def touching(aId: Long, bId: Long): Boolean =
    aId % 7 == 0 || bId % 7 == 0

  test("x86: simhash delta route from a parquet (id, simhash) index " +
    "equals full recompute restricted to delta-touching pairs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val (delta, corpus) = split(docs)

    val dir = s"${Files.createTempDirectory("simhash-index-")}/fps"
    Dedup.simhash(corpus, poly = true).write.parquet(dir)
    // read-back: the probe's corpus side is ONLY these 16-byte rows
    val index = spark.read.parquet(dir)

    val got = Dedup.simhashPairsDelta(delta, index,
      maxHamming = 3, poly = true)
      .as[(Long, Long, Int)].collect().toSet
    val full = Dedup.simhashPairs(docs, maxHamming = 3, poly = true)
      .as[(Long, Long, Int)].collect().toSet
      .filter(p => touching(p._1, p._2))
    assert(got === full)
    assert(got.nonEmpty) // the corpus plants near-duplicates
    assert(got.exists(p => p._1 % 7 == 0 ^ p._2 % 7 == 0),
      "fixture must exercise delta-corpus pairs, not just delta-delta")
  }

  test("x87: edit-distance delta route from a parquet EditIndex equals " +
    "full recompute restricted to delta-touching pairs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val (delta, corpus) = split(docs)

    val built = EditSimilarity.editIndex(corpus, maxDist = 8, q = 4)
    val dir = Files.createTempDirectory("edit-index-")
    built.docs.write.parquet(s"$dir/docs")
    built.gramDf.write.parquet(s"$dir/grams")
    val index = EditSimilarity.EditIndex(
      spark.read.parquet(s"$dir/docs"),
      spark.read.parquet(s"$dir/grams"), q = 4, maxDist = 8)

    val got = EditSimilarity.editDistancePairsDelta(delta, index)
      .as[(Long, Long, Int)].collect().toSet
    val full = EditSimilarity.editDistancePairs(docs, maxDist = 8, q = 4)
      .as[(Long, Long, Int)].collect().toSet
      .filter(p => touching(p._1, p._2))
    assert(got === full)
    assert(got.nonEmpty)
  }

  test("x87: delta docs with grams the frozen dictionary has never " +
    "seen still pair correctly (df 0 under the frozen order)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different corpus document about nothing much")
    ).toDF("doc_id", "text")
    // delta doc 7 is one edit from corpus doc 1; delta docs 14/21 are
    // near-identical to each other and built from tokens (hence q-grams)
    // absent from the corpus; corpus-corpus pair must NOT appear
    val delta = Seq(
      (7L, "the quick brown fox jumps over the lazy dog tonite"),
      (14L, "xylophone quartz vixen glyph jukebox zephyr mystique"),
      (21L, "xylophone quartz vixen glyph jukebox zephyr mystiquE")
    ).toDF("doc_id", "text")

    val index = EditSimilarity.editIndex(corpus, maxDist = 4, q = 4)
    val got = EditSimilarity.editDistancePairsDelta(delta, index)
      .as[(Long, Long, Int)].collect().toSet
    val full = EditSimilarity
      .editDistancePairs(corpus.unionByName(delta), maxDist = 4, q = 4)
      .as[(Long, Long, Int)].collect().toSet
      .filter(p => p._1 >= 7 || p._2 >= 7)
    assert(got === full)
    assert(got.exists(p => p._1 == 1L && p._2 == 7L))
    assert(got.exists(p => p._1 == 14L && p._2 == 21L))
  }

  test("x101: n-gram Jaccard delta route from a parquet JaccardIndex " +
    "equals full recompute restricted to delta-touching pairs") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val (delta, corpus) = split(docs)

    val built = Dedup.jaccardIndex(corpus, threshold = 0.5, n = 3,
      blockCol = Some("source"))
    val dir = Files.createTempDirectory("jaccard-index-")
    built.docs.write.parquet(s"$dir/docs")
    built.gramDf.write.parquet(s"$dir/grams")
    // read-back: the corpus side is ONLY the persisted prefix/gram-set
    // relations — index sufficiency proven structurally
    val index = Dedup.JaccardIndex(
      spark.read.parquet(s"$dir/docs"),
      spark.read.parquet(s"$dir/grams"), threshold = 0.5, n = 3)

    val got = Dedup.ngramJaccardDelta(delta, index,
      blockCol = Some("source"))
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.ngramJaccardBlocked(
      docs, "source", threshold = 0.5, n = 3)
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => touching(p._1, p._2))
    assert(got === full)
    assert(got.nonEmpty) // the corpus plants near-duplicates
    assert(got.exists(p => p._1 % 7 == 0 ^ p._2 % 7 == 0),
      "fixture must exercise delta-corpus pairs, not just delta-delta")
  }

  test("x101: delta docs whose grams the frozen dictionary has never " +
    "seen still pair correctly (unseen grams rank rarest, and only " +
    "delta-delta pairs can share them)") {
    // corpus over one alphabet; two delta twins over a DISJOINT
    // alphabet (every gram unseen) plus one delta twin of a corpus doc
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "an entirely different corpus document body here")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (7L, "zzz yyy xxx www vvv uuu zzz yyy xxx www"),
      (14L, "zzz yyy xxx www vvv uuu zzz yyy xxx www"),
      (21L, "the quick brown fox jumps over the lazy dog again!")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardDelta(delta,
      Dedup.jaccardIndex(corpus, threshold = 0.5, n = 3))
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.ngramJaccardBlocked(
      corpus.unionByName(delta).withColumn("_all", lit("a")), "_all",
      threshold = 0.5, n = 3)
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => touching(p._1, p._2))
    assert(got === full)
    assert(got.exists(p => p._1 == 7L && p._2 == 14L)) // unseen-gram twins
    assert(got.exists(p => p._1 == 1L && p._2 == 21L)) // delta-corpus
  }

  test("x101 randomized: random corpora with planted near-dups and " +
    "varying delta splits — delta route equals restricted full " +
    "recompute every time") {
    val rnd = new scala.util.Random(89)
    for ((mod, trial) <- Seq(3, 5).zipWithIndex) {
      def randText(n: Int) =
        (0 until n).map(_ => "abcdefgh"(rnd.nextInt(8))).mkString
      val bases = (0 until 12).map(_ => randText(20 + rnd.nextInt(30)))
      // near-dup families: each base plus 1-2 lightly-edited twins
      val docs = bases.zipWithIndex.flatMap { case (b, i) =>
        val twins = (0 until 1 + rnd.nextInt(2)).map { t =>
          val pos = rnd.nextInt(b.length)
          b.substring(0, pos) + "abcdefgh"(rnd.nextInt(8)) +
            b.substring(math.min(pos + 1, b.length))
        }
        (b +: twins).zipWithIndex.map { case (s, j) =>
          ((i * 10 + j).toLong, s)
        }
      }.toDF("doc_id", "text")
      val delta = docs.filter(col("doc_id") % mod === 0)
      val corpus = docs.filter(col("doc_id") % mod =!= 0)
      val got = Dedup.ngramJaccardDelta(delta,
        Dedup.jaccardIndex(corpus, threshold = 0.6, n = 3))
        .as[(Long, Long, Double)].collect().toSet
      val full = Dedup.ngramJaccardBlocked(
        docs.withColumn("_b", lit("a")), "_b", threshold = 0.6, n = 3)
        .as[(Long, Long, Double)].collect().toSet
        .filter(p => p._1 % mod == 0 || p._2 % mod == 0)
      assert(got === full, s"trial=$trial mod=$mod")
      assert(got.nonEmpty, s"trial=$trial planted twins must pair")
    }
  }

  test("x102: paragraph-dedup delta route from a parquet hash index " +
    "equals batch dedupParagraphs under corpus-first arrival order, " +
    "restricted to delta docs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val (delta, corpus) = split(docs)
    val delim = " the "

    val dir = s"${Files.createTempDirectory("para-index-")}/h"
    Dedup.paragraphHashIndex(corpus, delimiter = delim).write.parquet(dir)
    val got = Dedup.dedupParagraphsDelta(delta,
      spark.read.parquet(dir), delimiter = delim, rejoin = delim)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // arrival order: shift delta ids past every corpus id so the batch
    // operator's (id, idx) canonical pick = corpus-then-delta arrival
    val shift = 1000000L
    val want = Dedup.dedupParagraphs(
      corpus.unionByName(delta.withColumn("doc_id",
        col("doc_id") + shift)),
      delimiter = delim, rejoin = delim)
      .filter(col("doc_id") >= shift)
      .as[(Long, String, Long)].collect()
      .map(r => (r._1 - shift) -> ((r._2, r._3))).toMap
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.values.exists(_._2 > 0), "fixture must drop paragraphs")
    assert(got.values.exists(_._2 == 0), "untouched docs pass through")
  }

  test("x86: with both fingerprint relations persisted, the delta plan " +
    "contains NO text-hash kernel and never scans document text — " +
    "signatures are read, chunk keys are projections") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val (delta, corpus) = split(docs)
    val base = Files.createTempDirectory("simhash-index2-")
    Dedup.simhash(corpus, poly = true).write.parquet(s"$base/corpus")
    Dedup.simhash(delta, poly = true).write.parquet(s"$base/delta")
    val plan = Dedup.simhashPairsDeltaFps(
      spark.read.parquet(s"$base/delta"),
      spark.read.parquet(s"$base/corpus"), maxHamming = 3)
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains(sfDir),
      s"delta plan must not re-read document text:\n$plan")
    val kernelHits = "simhash64|poly_simhash".r.findAllIn(plan.toLowerCase).size
    assert(kernelHits === 0,
      s"expected zero simhash kernel sites over persisted fps, got $kernelHits in:\n$plan")
  }
}
