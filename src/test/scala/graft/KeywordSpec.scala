package graft

import org.apache.spark.sql.functions._

import graft.functions.{KeywordExprs, TextAnalysis}
import graft.operators.Similarity

/** Laws for the Aho–Corasick keyword kernel, the sign random
  * projection, and the synthetic-PII decoration (the x149/x150–x152
  * surfaces). */
class KeywordSpec extends SparkTestBase {
  import spark.implicits._

  /** Byte-level brute-force occurrence count — the definition. */
  private def naive(text: String, kw: String): Long = {
    val t = text.getBytes("UTF-8")
    val k = kw.getBytes("UTF-8")
    (0 to t.length - k.length).count(p =>
      java.util.Arrays.equals(t, p, p + k.length, k, 0, k.length)).toLong
  }

  private def counts(text: String, kws: Seq[String]): Seq[Long] =
    Seq(text).toDF("text")
      .select(KeywordExprs.keywordCounts($"text", kws))
      .as[Seq[Long]].head()

  test("keywordCounts: overlapping occurrences count — within one " +
    "keyword, across keywords, and cross-word") {
    // self-bordered pattern: "aa" occurs at positions 0 and 1 of "aaa"
    assert(counts("aaa", Seq("aa")) === Seq(2L))
    // nested patterns both count at the shared span
    assert(counts("the scan ran", Seq("scan", "an", "n")) ===
      Seq(1L, 2L, 2L))
    // cross-word (space-carrying) pattern
    assert(counts("a fast scan is a fast scan", Seq("fast scan", "a ")) ===
      Seq(2L, 2L))
    // no match, match at start, match at end
    assert(counts("abc", Seq("zz", "ab", "bc", "abc")) ===
      Seq(0L, 1L, 1L, 1L))
  }

  test("keywordCounts: multibyte UTF-8 patterns count by code-point " +
    "sequence (byte alignment only on boundaries)") {
    val kws = Seq("日本", "本", "𝄞", "é")
    val text = "日本本 𝄞𝄞 café 日本"
    assert(counts(text, kws) ===
      kws.map(naive(text, _)))
  }

  test("keywordCounts: null text yields null, not zeros") {
    val r = Seq[Option[String]](None, Some("spark")).toDF("text")
      .select(KeywordExprs.keywordCounts($"text", Seq("spark")))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[Long](0) === Seq(1L))
  }

  test("keywordCounts: empty and duplicate keyword lists fail loudly") {
    intercept[IllegalArgumentException] {
      KeywordExprs.keywordCounts($"text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      KeywordExprs.keywordCounts($"text", Seq("a", "a"))
    }
    // empty PATTERN (would match everywhere) dies in the automaton
    val e = intercept[Exception] {
      Seq("x").toDF("text")
        .select(KeywordExprs.keywordCounts($"text", Seq("a", "")))
        .collect()
    }
    assert(e.getMessage != null)
  }

  private def messageChain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) {
      if (t.getMessage != null) sb.append(t.getMessage).append('\n')
      t = t.getCause
    }
    sb.toString
  }

  test("keywordCounts: oversized pattern set fails the byte-budget " +
    "guard, not the JVM") {
    val big = (0 until 200).map(i => "k" * 30 + i.toString)
    val e = intercept[Exception] {
      Seq("x").toDF("text")
        .select(KeywordExprs.keywordCounts($"text", big)).collect()
    }
    assert(messageChain(e).contains("cap"))
  }

  /** Driver-side sign reference: identical exact-BIGINT arithmetic to
    * Similarity.rpSign (two affine+square rounds mod 2^31−1, parity). */
  private def rpSignRef(i: Int, j: Int): Double = {
    val p = 2147483647L
    val x = i.toLong * 131L + j.toLong + 17L
    val y = (x * 48271L + 11L) % p
    val z = (y * y) % p
    val w = (z * 48271L + 17L) % p
    val u = (w * w) % p
    if (u % 2L == 1L) -1.0 else 1.0
  }

  test("randomProjectVec: matches the driver-side reference fold and " +
    "is deterministic across plans") {
    val v = (0 until 64).map(i => (i % 7).toFloat - 3.0f)
    val expect = (0 until 16).map { j =>
      var acc = 0.0
      for (i <- 0 until 64) acc += v(i).toDouble * rpSignRef(i, j)
      acc / math.sqrt(16.0)
    }
    val got = Seq(v).toDF("embedding")
      .select(Similarity.randomProjectVec($"embedding", 64, 16))
      .as[Seq[Double]].head()
    assert(got === expect)
    val again = Seq(v).toDF("embedding")
      .select(Similarity.randomProjectVec($"embedding", 64, 16))
      .as[Seq[Double]].head()
    assert(again === got)
  }

  test("rp sign matrix is not degenerate: no duplicate columns, column " +
    "cross-correlation in the random-sign regime (the affine-LCG bug " +
    "class this guards produced duplicate columns and mean |corr| 0.49)") {
    // recover the matrix through the public surface: projecting the
    // i-th basis vector reads row i of M/√k
    val rows = (0 until 64).map { i =>
      val basis = Seq.tabulate(64)(x => if (x == i) 1.0f else 0.0f)
      Seq(basis).toDF("embedding")
        .select(Similarity.randomProjectVec($"embedding", 64, 16))
        .as[Seq[Double]].head()
    }
    val cols = (0 until 16).map(j => rows.map(_(j)))
    val corrs = for {
      a <- 0 until 16; b <- (a + 1) until 16
    } yield math.abs(cols(a).zip(cols(b)).map { case (x, y) => x * y }
      .sum / cols(a).map(x => x * x).sum)
    assert(corrs.max < 0.6, s"duplicate/near-duplicate columns: ${corrs.max}")
    assert(corrs.sum / corrs.size < 0.2,
      s"mean |column correlation| ${corrs.sum / corrs.size} — structured, " +
        "not random-sign quality")
  }

  test("rpDistortion: parallel vectors read cos 1.0 in BOTH spaces " +
    "(linearity), abs_err column is consistent, pair set is the " +
    "strict lower triangle") {
    val base = (0 until 64).map(i => ((i * 37 + 5) % 11).toFloat - 5.0f)
    val emb = Seq(
      (0L, base),
      (1L, base.map(_ * 2.0f)), // parallel → cosine 1 in any linear image
      (2L, (0 until 64).map(i => ((i * 13 + 3) % 7).toFloat - 3.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.rpDistortion(emb, sampleIds = 3, dIn = 64,
      kOut = 16)
      .select($"vec_a", $"vec_b", $"cos_full", $"cos_proj", $"abs_err")
      .as[(Long, Long, Double, Double, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    val p01 = got.find(r => r._1 == 0L && r._2 == 1L).get
    assert(p01._3 === 1.0 && p01._4 === 1.0 && p01._5 === 0.0)
    for (r <- got)
      assert(r._5 === BigDecimal(math.abs(r._3 - r._4))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("randomProjectVec: width mismatch fails loudly (no silent null)") {
    val e = intercept[Exception] {
      Seq(Seq(1.0f, 2.0f)).toDF("embedding")
        .select(Similarity.randomProjectVec($"embedding", 64, 16))
        .collect()
    }
    assert(messageChain(e).contains("dim mismatch"))
  }

  test("decorateSyntheticPii ∘ scrubPii: every planted span masks — " +
    "exactly 5 tags per row and no residual digits or @") {
    val rows = (0L until 50L).map(i => (i, s"doc body $i words"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.scrubPii(TextAnalysis.decorateSyntheticPii(
        $"text", $"doc_id")).as("redacted"))
      .as[String].collect()
    for (r <- rows) {
      assert(!r.contains("@"), r)
      // the full decorated suffix masks to one deterministic constant —
      // nothing of any planted span survives
      assert(r.endsWith(
        " contact <EMAIL> ip <IP> ssn <SSN> call <PHONE> card <CC>"), r)
    }
  }
}
