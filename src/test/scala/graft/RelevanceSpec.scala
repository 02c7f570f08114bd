package graft

import org.apache.spark.sql.functions._

import graft.operators.Relevance

class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark joins data fast"),
    (2L, "spark spark spark streams"),
    (3L, "ducks swim in rows"),
    (4L, ""),
    (5L, null.asInstanceOf[String]))

  test("bm25 matches a driver-side reference; empty/null docs score 0") {
    val k1 = 1.2
    val b = 0.75
    val query = "spark rows absent"
    val docsTok = corpus.map { case (id, t) =>
      id -> Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docsTok.size.toDouble
    val avgdl = docsTok.values.map(_.size).sum / n
    def dfOf(t: String) = docsTok.values.count(_.contains(t)).toDouble
    def ref(id: Long): Double = {
      val tk = docsTok(id)
      val score = query.split(" ").distinct.sorted.map { t =>
        val df = dfOf(t)
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        val tf = tk.count(_ == t).toDouble
        idf * (tf * (k1 + 1)) /
          (tf + k1 * ((1 - b) + b * tk.size / avgdl))
      }.sum
      math.BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val got = Relevance.bm25(corpus.toDF("doc_id", "text"), query, k1, b)
      .as[(Long, Double)].collect().toMap
    corpus.foreach { case (id, _) =>
      assert(math.abs(got(id) - ref(id)) < 1e-9, s"doc $id")
    }
    // the term-frequency-heavy doc outranks the single-mention doc,
    // and docs without query tokens score exactly 0
    assert(got(2L) > got(1L))
    assert(got(3L) > 0.0)
    assert(got(4L) === 0.0)
    assert(got(5L) === 0.0)
  }

  test("inverted index: df-capped posting rows, hot tokens excluded") {
    val docs = (Seq.tabulate(8)(i => (i.toLong, "common alpha")) ++
      Seq((8L, "common rare alpha"), (9L, "rare other"))).toDF("doc_id", "text")
    // 10 docs, cap 0.5 -> df <= 5: common (9) and alpha (9) excluded
    val got = Relevance.invertedIndex(docs, maxDfFraction = 0.5)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("rare", 2L, 8L), ("rare", 2L, 9L), ("other", 1L, 9L)))
    // boundary: cap exactly at a token's df keeps it (<=, not <)
    val atCap = Relevance.invertedIndex(docs, maxDfFraction = 0.9)
      .as[(String, Long, Long)].collect()
    assert(atCap.exists(_._1 == "common"), "df 9 <= 0.9*10 kept")
  }

  test("lmQualityScore: hand-computed add-k bigram NLL; short docs " +
    "omitted") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    // c2: (a,b)=3, (b,a)=1, (b,c)=1; c1: a->3, b->2; V=4 (the
    // vocabulary counts ALL tokens, including doc 3's bigram-less one)
    val pAB = (3 + 0.5) / (3 + 0.5 * 4)
    val pBA = (1 + 0.5) / (2 + 0.5 * 4)
    val pBC = (1 + 0.5) / (2 + 0.5 * 4)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Relevance.lmQualityScore(docs)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(1L, 2L)) // doc 3 has no bigrams
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 ===
      r6(-(2 * math.log(pAB) + math.log(pBA)) / 3))
    assert(got(2L)._1 === 2L)
    assert(got(2L)._2 === r6(-(math.log(pAB) + math.log(pBC)) / 2))
  }

  test("lmQualityScore cross-corpus: unseen bigrams get smoothed " +
    "positive mass (no division by zero, no -inf)") {
    val reference = Seq((10L, "x y")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = Relevance.lmQualityScore(docs, reference)
      .as[(Long, Long, Double)].collect()
    // V = 2, P = (0 + .5) / (0 + .5*2) = 0.5 -> nll = ln 2
    assert(got.length === 1)
    assert(math.abs(got(0)._3 - math.log(2)) < 1e-6)
    // a doc written in the reference's word ORDER scores lower (more
    // likely) than the same vocabulary permuted into bigrams the
    // reference never uses — the discrimination a perplexity cut needs
    val sentence = "the quick brown fox jumps over the lazy dog"
    val reference2 = Seq.tabulate(20)(i => (100L + i, sentence))
      .toDF("doc_id", "text")
    val probe = Seq(
      (9000001L, "the quick brown fox jumps"),
      (9000002L, "fox brown quick jumps the")).toDF("doc_id", "text")
    val scores = Relevance.lmQualityScore(probe, reference2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(9000001L) < scores(9000002L))
  }
}
