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
}
