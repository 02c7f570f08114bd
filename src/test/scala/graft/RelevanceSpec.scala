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

  // ---- DSIR importance weights ----

  private def polyHash(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 131 + cp) % 1000000007L)
    h
  }

  private def dsirRef(docs: Seq[(Long, String, Boolean)], dim: Int)
      : Map[Long, (Long, Double)] = {
    def feats(t: String): Seq[Int] = {
      val tk = Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty)
      val uni = tk.map(w => (polyHash(w) % dim).toInt)
      val bi = tk.sliding(2).filter(_.length == 2)
        .map(p => (polyHash(p(0) + " " + p(1)) % dim).toInt).toSeq
      (uni ++ bi).toSeq
    }
    val all = docs.flatMap { case (_, t, tgt) => feats(t).map(_ -> tgt) }
    val raw = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tgt = all.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val nR = all.size.toDouble; val nT = all.count(_._2).toDouble
    def lw(b: Int): Double =
      math.log((tgt.getOrElse(b, 0L) + 1.0) / (nT + dim)) -
        math.log((raw.getOrElse(b, 0L) + 1.0) / (nR + dim))
    docs.map { case (id, t, _) =>
      val fs = feats(t)
      id -> (fs.size.toLong,
        math.BigDecimal(fs.map(lw).sum).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("dsirWeights matches a driver-side reference and separates a " +
    "target-like slice from an off-target one") {
    // two disjoint token distributions: target docs draw from the
    // "clean" vocabulary, off-target from the "boiler" one, plus one
    // mixed doc, one empty, one null
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta", true),
      (2L, "beta alpha gamma alpha beta beta", true),
      (3L, "click here buy now click here", false),
      (4L, "buy now buy now click click", false),
      (5L, "alpha click beta now", false),
      (6L, "", false),
      (7L, null.asInstanceOf[String], true))
    val dim = 64
    val got = Relevance.dsirWeights(
      docs.toDF("doc_id", "text", "tgt"), col("tgt"), dim)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = dsirRef(docs, dim)
    assert(got.keySet === docs.map(_._1).toSet)
    for ((id, (nf, w)) <- ref) {
      assert(got(id)._1 === nf, s"n_features of doc $id")
      assert(math.abs(got(id)._2 - w) < 2e-6, s"log_weight of doc $id")
    }
    // the defining DSIR property: target-vocabulary docs weigh above
    // the boilerplate docs, the mixed doc lands between
    val w = got.view.mapValues(_._2).toMap
    assert(math.min(w(1L), w(2L)) > w(5L))
    assert(w(5L) > math.max(w(3L), w(4L)))
    // empty/null docs: no features, zero weight
    assert(got(6L) === ((0L, 0.0)))
    assert(got(7L) === ((0L, 0.0)))
  }

  test("dsirResample: deterministic Gumbel-top-k — exactly k rows, a " +
    "subset of the corpus, stable across runs, keys recomputable") {
    val docs = (1L to 40L).map { i =>
      val t = if (i % 2 == 0) "alpha beta gamma delta"
      else "click here buy now"
      (i, t + " tok" + (i % 7), i % 2 == 0)
    }
    val df = docs.toDF("doc_id", "text", "tgt")
    val k = 10
    val a = Relevance.dsirResample(df, col("tgt"), k, dim = 64)
      .as[(Long, Double, Double)].collect()
    val b = Relevance.dsirResample(df, col("tgt"), k, dim = 64)
      .as[(Long, Double, Double)].collect()
    assert(a.length === k)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._1).toSet.subsetOf(docs.map(_._1).toSet))
    // keys really are weight + Gumbel(hash): recompute one
    val weights = Relevance.dsirWeights(df, col("tgt"), 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    for ((id, lw, key) <- a) {
      assert(math.abs(lw - weights(id)) < 1e-9)
      val u = (polyHash("dsir:" + id) + 0.5) / 1000000007.0
      val g = -math.log(-math.log(u))
      assert(math.abs(key - (lw + g)) < 2e-6, s"key of doc $id")
    }
    // selection is weight-biased: most survivors are target-like docs
    assert(a.map(_._1).count(_ % 2 == 0) > k / 2)
  }

  // ---- Kneser–Ney LM ----

  test("knLmScore matches a driver-side interpolated-KN reference on " +
    "self-scoring, and cross-corpus unseen contexts back off to the " +
    "continuation model") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "b c b a a"),
      (3L, "c c a b b"),
      (4L, "a"),
      (5L, ""))
    val df = docs.toDF("doc_id", "text")
    val tok = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val bigrams = tok.values.flatMap(t =>
      t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))).toSeq
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val n1b = c2.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = c2.size.toDouble
    val v = tok.values.flatten.toSet.size.toDouble
    val d = 0.75
    def pc(w2: String): Double =
      (n1b.getOrElse(w2, 0L) + 0.5) / (tt + 0.5 * v)
    def p(w1: String, w2: String): Double = c1.get(w1) match {
      case Some((n1, n1f)) =>
        math.max(c2.getOrElse((w1, w2), 0L) - d, 0.0) / n1 +
          d * n1f / n1 * pc(w2)
      case None => pc(w2)
    }
    def refNll(id: Long): Option[Double] = {
      val bs = tok(id).sliding(2).filter(_.length == 2)
        .map(p2 => (p2(0), p2(1))).toSeq
      if (bs.isEmpty) None
      else Some(-bs.map(b => math.log(p(b._1, b._2))).sum / bs.size)
    }
    val got = Relevance.knLmScore(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // <2-token docs omitted
    for (id <- got.keySet)
      assert(math.abs(got(id) - refNll(id).get) < 2e-6, s"doc $id")
    // probability sanity on a seen context: interpolated mass over the
    // OBSERVED vocabulary stays within (0, 1] + smoothing headroom
    val mass = Seq("a", "b", "c").map(w2 => p("a", w2)).sum
    assert(mass > 0.9 && mass < 1.1)
    // cross-corpus: a probe with an unseen context scores via the
    // continuation model (finite, positive NLL) rather than erroring
    val probe = Seq((10L, "zzz a qqq b")).toDF("doc_id", "text")
    val cross = Relevance.knLmScore(probe, df)
      .as[(Long, Long, Double)].collect()
    assert(cross.length === 1 && cross.head._2 === 3L)
    assert(cross.head._3 > 0 && java.lang.Double.isFinite(cross.head._3))
    // and a fluent-under-reference probe scores lower than a shuffled
    // rare-continuation one (the filter-threshold consumption contract)
    val fluent = Seq((11L, "a b a b c")).toDF("doc_id", "text")
    val garbled = Seq((12L, "zzz qqq zzz qqq zzz")).toDF("doc_id", "text")
    val nf = Relevance.knLmScore(fluent, df)
      .as[(Long, Long, Double)].collect().head._3
    val ng = Relevance.knLmScore(garbled, df)
      .as[(Long, Long, Double)].collect().head._3
    assert(nf < ng)
  }
}
