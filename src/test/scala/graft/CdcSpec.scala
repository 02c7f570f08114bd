package graft

import org.apache.spark.sql.functions._

import graft.functions.CdcExprs
import graft.operators.Dedup

/** Laws for content-defined chunking (x153/x154): the kernel against a
  * straightforward reference, the SHIFT-ROBUSTNESS property that is
  * CDC's reason to exist, and the duplicate-chunk detector on planted
  * shifted duplicates. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val P = 2147483647L
  private val B = 257L
  private val W = 16
  private val Mask = 63L

  /** Straightforward reference: recompute every window hash from
    * scratch (no rolling update — shares no arithmetic shortcut with
    * the kernel). */
  private def refChunks(text: String): Seq[(Int, Int, Long)] = {
    val b = text.getBytes("UTF-8")
    val n = b.length
    if (n == 0) return Seq.empty
    def polyHash(from: Int, until: Int): Long = {
      var h = 0L
      for (j <- from until until) h = (h * B + (b(j) & 0xff)) % P
      h
    }
    val bounds0 = (W to n).filter(i =>
      (polyHash(i - W, i) & Mask) == Mask)
    val bounds =
      if (bounds0.isEmpty || bounds0.last != n) bounds0 :+ n else bounds0
    var start = 0
    bounds.map { e =>
      val c = (start, e - start, polyHash(start, e)); start = e; c
    }
  }

  private def kernelChunks(text: String): Seq[(Int, Int, Long)] =
    Seq(text).toDF("text")
      .select(CdcExprs.cdcChunks($"text", 16, 6))
      .as[Seq[(Int, Int, Long)]].head()

  test("kernel equals the from-scratch reference on adversarial " +
    "strings (short, boundary-dense, long, multibyte)") {
    val texts = Seq(
      "", "a", "short", "x" * 15, "x" * 16, "x" * 17,
      "the quick brown fox jumps over the lazy dog " * 20,
      (0 until 3000).map(i => ('a' + i % 26).toChar).mkString,
      "日本語のテキスト " * 40, // multibyte: byte-level contract
      "a b " * 500)
    for (t <- texts)
      assert(kernelChunks(t) === refChunks(t), s"text len ${t.length}")
  }

  test("shift robustness: every non-first chunk of a document " +
    "reappears verbatim after a prefix insertion (boundaries are " +
    "window-local, so only the first chunk can change)") {
    // aperiodic fixture: a periodic string has only ~period distinct
    // windows and may legitimately produce zero mask hits
    val words = Seq("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash")
    val doc = (0 until 400).map(i => words(i % 10) + i).mkString(" ")
    for (ins <- Seq("X", "inserted preamble ", "Z" * 100)) {
      val orig = kernelChunks(doc).map(c => (c._2, c._3)) // (len, fp)
      val shifted = kernelChunks(ins + doc).map(c => (c._2, c._3))
      assert(orig.size > 3, s"fixture degenerate: ${orig.size} chunks")
      // multiset containment of all-but-first original chunks
      val have = scala.collection.mutable.Map.empty[(Int, Long), Int]
      shifted.foreach(c => have(c) = have.getOrElse(c, 0) + 1)
      for (c <- orig.drop(1)) {
        assert(have.getOrElse(c, 0) > 0,
          s"chunk $c lost after inserting '${ins.take(10)}…'")
        have(c) -= 1
      }
      // and by the same locality, a fixed-offset scheme would lose
      // every chunk: the shift moved all byte offsets
      assert(shifted.head != orig.head || ins.isEmpty)
    }
  }

  test("cdcDupChunks finds a duplicated span pasted into otherwise " +
    "different documents; whole-doc hashing cannot") {
    val shared = "value fast merge batch part value fast spark " * 8
    val docs = Seq(
      (1L, "alpha " * 20 + shared + "omega " * 20),
      (2L, "gamma " * 33 + shared + "delta " * 11),
      (3L, "unrelated text entirely " * 25)
    ).toDF("doc_id", "text")
    val dup = Dedup.cdcDupChunks(docs, minLen = 24)
      .as[(Long, Int, Long, Long)].collect()
    assert(dup.nonEmpty, "no shared chunks found in the planted overlap")
    assert(dup.forall(_._3 >= 2))
    // whole-doc content hash sees three distinct documents
    assert(docs.select(Dedup.contentHash($"text")).distinct().count() === 3)
  }

  test("cdcOverlapPairs names the pair behind the planted duplicate " +
    "span, and the boilerplate cap drops ubiquitous chunks before " +
    "they explode into k² pairs") {
    // aperiodic planted spans (a periodic span has ~period distinct
    // windows and may deterministically produce no interior boundary)
    val shared = (0 until 60).map(k => s"shared$k").mkString(" ")
    val boiler = (0 until 50).map(k => s"footer$k").mkString(" ")
    val docs = (1L to 20L).map { i =>
      val body = s"doc $i " + (0 until 60).map(k => s"w${i * 100 + k}")
        .mkString(" ")
      // docs 1 and 2 share `shared`; EVERY doc carries `boiler`
      val extra = if (i <= 2) shared else ""
      (i, body + " " + extra + boiler)
    }.toDF("doc_id", "text")
    val pairs = Dedup.cdcOverlapPairs(docs, minSharedBytes = 48,
      maxDocsPerChunk = 8)
      .select($"doc_a", $"doc_b", $"shared_bytes")
      .as[(Long, Long, Long)].collect()
    // the planted pair surfaces, with the LARGEST overlap
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted pair missing: ${pairs.toSeq}")
    assert(pairs.maxBy(_._3)._1 == 1L && pairs.maxBy(_._3)._2 == 2L)
    // the cap keeps the 20-doc boilerplate from exploding into k²
    // pairs: a handful of junction-dependent low-cardinality chunks
    // may legitimately pair (CDC locality), but nothing near all-pairs
    assert(pairs.length <= 5, s"cap leaked: ${pairs.toSeq}")
    val uncapped = Dedup.cdcOverlapPairs(docs, minSharedBytes = 48,
      maxDocsPerChunk = 1000000).count()
    assert(uncapped >= 150L,
      s"fixture degenerate: uncapped only $uncapped pairs")
    intercept[IllegalArgumentException] {
      Dedup.cdcOverlapPairs(docs, maxDocsPerChunk = 1)
    }
  }

  test("cdcOverlapDelta ≡ cdcOverlapPairs restricted to cross pairs " +
    "(uncapped): probing the index finds exactly what re-running the " +
    "batch over the union would") {
    val shared = (0 until 60).map(k => s"xs$k").mkString(" ")
    val docs = (1L to 20L).map { i =>
      val body = s"doc $i " + (0 until 50).map(k => s"v${i * 137 + k}")
        .mkString(" ")
      // span shared across the split boundary (1 ↔ 10, 3 ↔ 20) and
      // within the corpus (3 ↔ 7, must NOT appear in the delta route)
      val extra =
        if (Seq(1L, 10L, 3L, 20L, 7L).contains(i)) shared else ""
      (i, body + " " + extra)
    }.toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val delta = docs.filter($"doc_id" % 10 === 0)
    val viaDelta = Dedup.cdcOverlapDelta(delta,
        Dedup.cdcChunkIndex(corpus), minSharedBytes = 48,
        maxDocsPerChunk = 1000000)
      .select($"doc_delta", $"doc_corpus", $"shared_chunks",
        $"shared_bytes")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Dedup.cdcOverlapPairs(docs, minSharedBytes = 48,
        maxDocsPerChunk = 1000000)
      .select($"doc_a", $"doc_b", $"shared_chunks", $"shared_bytes")
      .as[(Long, Long, Long, Long)].collect()
    val cross = batch.flatMap { case (a, b, c, s) =>
      val aD = a % 10 == 0; val bD = b % 10 == 0
      if (aD && !bD) Some((a, b, c, s))
      else if (bD && !aD) Some((b, a, c, s))
      else None
    }.toSet
    assert(viaDelta.nonEmpty, "fixture produced no cross pairs")
    assert(viaDelta === cross)
    // side discipline: doc_delta is always a delta doc, doc_corpus a
    // corpus doc — and the corpus-internal planted pair (3,7) exists
    // in the batch view but stays out of the delta route
    assert(viaDelta.forall(p => p._1 % 10 == 0 && p._2 % 10 != 0))
    assert(batch.exists(p => p._1 == 3L && p._2 == 7L))
  }

  test("the bounded kernel drives the whole family: with (min,max) " +
    "bounds set, cdcOverlapDelta over a bounded cdcChunkIndex equals " +
    "bounded cdcOverlapPairs restricted to cross pairs — and bounded " +
    "results legitimately differ from unbounded ones") {
    val shared = (0 until 60).map(k => s"bb$k").mkString(" ")
    val docs = (1L to 20L).map { i =>
      val body = s"doc $i " + (0 until 50).map(k => s"q${i * 211 + k}")
        .mkString(" ")
      val extra =
        if (Seq(1L, 10L, 4L, 20L).contains(i)) shared else ""
      (i, body + " " + extra)
    }.toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val delta = docs.filter($"doc_id" % 10 === 0)
    val (minC, maxC) = (8, 64)
    val viaDelta = Dedup.cdcOverlapDelta(delta,
        Dedup.cdcChunkIndex(corpus, minChunk = minC, maxChunk = maxC),
        minSharedBytes = 48, maxDocsPerChunk = 1000000,
        minChunk = minC, maxChunk = maxC)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Dedup.cdcOverlapPairs(docs, minSharedBytes = 48,
        maxDocsPerChunk = 1000000, minChunk = minC, maxChunk = maxC)
      .as[(Long, Long, Long, Long)].collect()
    val cross = batch.flatMap { case (a, b, c, s) =>
      val aD = a % 10 == 0; val bD = b % 10 == 0
      if (aD && !bD) Some((a, b, c, s))
      else if (bD && !aD) Some((b, a, c, s))
      else None
    }.toSet
    assert(viaDelta.nonEmpty, "fixture produced no cross pairs")
    assert(viaDelta === cross)
    // the bounds actually bite: the bounded chunk relation differs
    // from the unbounded one on this corpus
    val bounded = Dedup.cdcChunksBounded(docs, minChunk = minC,
      maxChunk = maxC).count()
    val unbounded = Dedup.cdcChunks(docs).count()
    assert(bounded !== unbounded, s"bounds did not bite: $bounded")
  }

  test("cdcDupStats charges duplicate chunk mass to every occurrence " +
    "except the corpus-canonical first arrival — within-doc repeats " +
    "included — and unique docs carry zero") {
    val shared = (0 until 60).map(k => s"dup$k").mkString(" ")
    val docs = Seq(
      (1L, "alpha " * 10 + shared),                    // canonical holder
      (2L, "beta " * 15 + shared + " gamma " * 5),     // cross-doc dup
      (3L, shared + " mid " + shared),                 // within-doc repeat
      (4L, (0 until 80).map(i => s"uniq$i").mkString(" "))) // untouched
      .toDF("doc_id", "text")
    val stats = Dedup.cdcDupStats(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 holds the canonical occurrences: no duplicate bytes beyond
    // any legitimately self-repeating chunk (there are none here)
    assert(stats(1L)._4 === 0L, stats(1L))
    // docs 2 and 3 re-carry doc 1's shared chunks
    assert(stats(2L)._4 > 0L, stats(2L))
    assert(stats(3L)._4 > 0L, stats(3L))
    // doc 3's SECOND copy of the span is duplicate mass even where its
    // first copy were canonical — it must exceed doc 2's single copy
    assert(stats(3L)._3 > stats(2L)._3, s"${stats(3L)} vs ${stats(2L)}")
    // unique doc: chunks, but zero duplicates
    assert(stats(4L)._2 > 0L && stats(4L)._3 === 0L && stats(4L)._4 === 0L)
    // conservation: total duplicate occurrences = total occurrences
    // minus distinct (fp, len, first-arrival) keys
    val ch = Dedup.cdcChunks(docs).filter($"len" >= 24)
    val totalOcc = ch.count()
    val distinctKeys = ch.select($"fp", $"len").distinct().count()
    assert(stats.values.map(_._3).sum === totalOcc - distinctKeys)
  }

  test("guards: null → null, parameter bounds fail loudly") {
    val r = Seq[Option[String]](None, Some("abc")).toDF("text")
      .select(CdcExprs.cdcChunks($"text", 16, 6)).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[Any](0).nonEmpty)
    intercept[IllegalArgumentException] {
      CdcExprs.cdcChunks($"text", 1, 6)
    }
    intercept[IllegalArgumentException] {
      CdcExprs.cdcChunks($"text", 16, 0)
    }
    intercept[IllegalArgumentException] { // minChunk < 1
      CdcExprs.cdcChunksBounded($"text", 16, 6, 0, 128)
    }
    intercept[IllegalArgumentException] { // max must exceed min
      CdcExprs.cdcChunksBounded($"text", 16, 6, 64, 64)
    }
  }

  // ---- LBFS chunk-length bounds (x157) ----------------------------

  /** Sequential from-scratch reference for the BOUNDED rule: mask
    * matches precomputed positionally (each window rehashed, no
    * rolling shortcut), then acceptance folded left — suppressed under
    * `minC` bytes since the previous boundary, forced at `maxC`. */
  private def refChunksBounded(text: String, minC: Int,
      maxC: Int): Seq[(Int, Int, Long)] = {
    val b = text.getBytes("UTF-8")
    val n = b.length
    if (n == 0) return Seq.empty
    def polyHash(from: Int, until: Int): Long = {
      var h = 0L
      for (j <- from until until) h = (h * B + (b(j) & 0xff)) % P
      h
    }
    val matches =
      (W to n).filter(i => (polyHash(i - W, i) & Mask) == Mask).toSet
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    var i = 1
    while (i <= n) {
      val len = i - start
      if (len >= maxC || (len >= minC && i >= W && matches(i))) {
        bounds += i; start = i
      }
      i += 1
    }
    if (bounds.isEmpty || bounds.last != n) bounds += n
    var s = 0
    bounds.map { e =>
      val c = (s, e - s, polyHash(s, e)); s = e; c
    }.toSeq
  }

  private def kernelChunksBounded(text: String, minC: Int,
      maxC: Int): Seq[(Int, Int, Long)] =
    Seq(text).toDF("text")
      .select(CdcExprs.cdcChunksBounded($"text", 16, 6, minC, maxC))
      .as[Seq[(Int, Int, Long)]].head()

  private val boundedFixtures: Seq[String] = Seq(
    "", "a", "short", "x" * 15, "x" * 16, "x" * 500, // mask-free runs
    "the quick brown fox jumps over the lazy dog " * 20,
    (0 until 3000).map(i => ('a' + i % 26).toChar).mkString,
    "日本語のテキスト " * 40,
    (0 until 400).map(i => Seq("key", "agg", "row", "scan", "slow",
      "fast", "table", "value", "part", "hash")(i % 10) + i)
      .mkString(" "))

  test("bounded kernel equals the sequential from-scratch reference " +
    "across (min,max) geometries, incl. mask-free forced-only runs") {
    for {
      t <- boundedFixtures
      (minC, maxC) <- Seq((32, 128), (8, 48), (1, 17), (24, 25))
    } assert(kernelChunksBounded(t, minC, maxC) ===
        refChunksBounded(t, minC, maxC),
      s"len ${t.length} bounds ($minC, $maxC)")
  }

  test("bounds hold: every chunk is <= maxChunk, every non-final " +
    "chunk is >= minChunk (the doc-end boundary may undershoot), and " +
    "(1, MaxValue) degenerates to the unbounded kernel exactly") {
    for (t <- boundedFixtures if t.nonEmpty) {
      val cs = kernelChunksBounded(t, 32, 128)
      assert(cs.forall(_._2 <= 128), s"len ${t.length}")
      assert(cs.dropRight(1).forall(_._2 >= 32), s"len ${t.length}")
      assert(kernelChunksBounded(t, 1, Int.MaxValue) === kernelChunks(t),
        s"len ${t.length}")
    }
  }

  test("bounded re-sync law: after a prefix insertion the two " +
    "segmentations are IDENTICAL from the first aligned boundary at " +
    "or past the window width — divergence cannot survive an aligned " +
    "boundary because acceptance is Markov in the previous boundary") {
    val doc = boundedFixtures.last // aperiodic, ~2.7 kB
    for (ins <- Seq("X", "inserted preamble ", "Z" * 100)) {
      val orig = kernelChunksBounded(doc, 32, 128)
      val shifted = kernelChunksBounded(ins + doc, 32, 128)
      val insLen = ins.getBytes("UTF-8").length
      val origEnds = orig.map(c => c._1 + c._2)
      val shiftedEnds = shifted.map(c => c._1 + c._2).toSet
      val sync = origEnds.find(q => q >= W && shiftedEnds(q + insLen))
      assert(sync.nonEmpty, s"no aligned boundary for '${ins.take(8)}…'")
      val q = sync.get
      val oSuffix = orig.dropWhile(c => c._1 + c._2 <= q)
      val sSuffix = shifted.dropWhile(c => c._1 + c._2 <= q + insLen)
      assert(oSuffix.map(c => (c._2, c._3)) ===
        sSuffix.map(c => (c._2, c._3)), s"ins '${ins.take(8)}…'")
      assert(oSuffix.nonEmpty, "fixture degenerate: sync at doc end")
    }
  }
}
