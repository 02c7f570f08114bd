package graft

import graft.operators.{Corpus, GroupedRank}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed grouped rank (range partition + bounded offset
  * table) and the operators built on it: the contract is exact
  * equality with the per-group window `row_number`, at a plan that
  * never funnels a whole group through one task. */
class GroupedRankSpec extends SparkTestBase {
  import spark.implicits._

  test("rankInGroup equals the window row_number for every numRanges, " +
    "including ranges that split groups and ties across boundaries") {
    val df = Seq(
      ("en", 5L, "a"), ("en", 5L, "b"), ("en", 3L, "c"), ("en", 9L, "d"),
      ("de", 2L, "a"), ("de", 2L, "b"), ("de", 7L, "c"),
      ("fr", 1L, "z")
    ).toDF("lang", "freq", "tok")
    val expected = df.withColumn("rank",
      row_number().over(Window.partitionBy($"lang")
        .orderBy($"freq".desc, $"tok")).cast("long"))
      .as[(String, Long, String, Long)].collect().toSet
    for (n <- Seq(1, 2, 3, 8)) {
      val got = GroupedRank.rankInGroup(df, $"lang",
          Seq($"freq".desc, $"tok"), "rank", numRanges = n)
        .as[(String, Long, String, Long)].collect().toSet
      assert(got === expected, s"numRanges=$n")
    }
  }

  test("rankInGroup: null groups rank as their own group instead of " +
    "dropping") {
    val df = Seq((Some("g"), 1L), (None, 2L), (None, 1L))
      .toDF("g", "v")
    val ranked = GroupedRank.rankInGroup(df, $"g", Seq($"v".asc), "rank")
    assert(ranked.count() === 3L) // nothing dropped
    // both null rows rank 1,2 within the null group; the "g" row is 1
    val nulls = ranked.filter($"g".isNull).select($"v", $"rank")
      .as[(Long, Long)].collect().toSet
    assert(nulls === Set((1L, 1L), (2L, 2L)))
  }

  test("rankInGroup: the offset-table cap fails fast with an " +
    "actionable message") {
    val df = (1 to 100).map(i => (i, i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      GroupedRank.rankInGroup(df, $"g", Seq($"v"), "rank",
        numRanges = 4, maxOffsetRows = 10)
    }
    assert(e.getMessage.contains("offset table"))
  }

  test("exactPercentilesGrouped equals the keyed-window route " +
    "(same quantile_cont definition) including tied values") {
    val rows = for (g <- Seq("a", "b", "c"); i <- 1 to 37)
      yield (g, ((i * 2654435761L) % 97).toDouble + (if (g == "b") 0.5 else 0.0))
    val df = rows.toDF("src", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val a = Corpus.exactPercentiles(df, "src", $"v", ps)
      .as[(String, Double, Double, Double)].collect().toSet
    for (n <- Seq(1, 3, 16)) {
      val b = Corpus.exactPercentilesGrouped(df, "src", $"v", ps, n)
        .as[(String, Double, Double, Double)].collect().toSet
      assert(b === a, s"numRanges=$n")
    }
  }

  test("prefixSumInGroup equals the keyed cumsum window for every " +
    "numRanges; capPerGroup/capTokensPerGroup/stratifiedSample " +
    "distributed routes equal their window routes") {
    val df = (1 to 60).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        (i * 7 % 13).toLong)
    }.toDF("id", "src", "toks")
    val viaWindow = df.withColumn("run",
      sum($"toks").over(Window.partitionBy($"src").orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, String, Long, Long)].collect().toSet
    for (n <- Seq(1, 2, 8)) {
      val got = GroupedRank.prefixSumInGroup(df, $"src", Seq($"id"),
          $"toks", "run", numRanges = n)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === viaWindow, s"numRanges=$n")
    }
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select($"id").as[Long].collect().toSet
    assert(ids(Corpus.capPerGroup(df, $"src", $"id", 5)) ===
      ids(Corpus.capPerGroup(df, $"src", $"id", 5, numRanges = 8)))
    assert(ids(Corpus.capTokensPerGroup(df, $"src", $"id", $"toks", 40L)) ===
      ids(Corpus.capTokensPerGroup(df, $"src", $"id", $"toks", 40L,
        numRanges = 8)))
    assert(ids(Corpus.stratifiedSample(df, $"id", $"src", 20L)) ===
      ids(Corpus.stratifiedSample(df, $"id", $"src", 20L, numRanges = 8)))
  }

  test("percentileGate drops exactly the per-group bottom fraction " +
    "under (score, id) order") {
    val df = Seq(
      // source a: 4 rows, drop floor(0.25*4)=1 (lowest score)
      (1L, "a", 0.9), (2L, "a", 0.1), (3L, "a", 0.5), (4L, "a", 0.7),
      // source b: 3 rows, drop floor(0.25*3)=0
      (5L, "b", 0.2), (6L, "b", 0.3), (7L, "b", 0.1),
      // tie on score in c: id breaks it, lower id drops
      (8L, "c", 0.4), (9L, "c", 0.4), (10L, "c", 0.4), (11L, "c", 0.9)
    ).toDF("doc_id", "source", "q")
    val kept = Corpus.percentileGate(df, $"q", "source", "doc_id",
        dropFraction = 0.25, scoreName = "score")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L, 6L, 7L, 9L, 10L, 11L))
  }

  test("zipfSlope: an exact power law fits slope -1; single-type " +
    "languages yield a null slope") {
    // freqs 12, 6, 4, 3 at ranks 1..4 = 12/rank exactly
    val docs = Seq(
      ("en", (("w1 " * 12) + ("w2 " * 6) + ("w3 " * 4) + ("w4 " * 3)).trim),
      ("solo", "only")
    ).toDF("lang", "text")
    val got = graft.operators.Vocab.zipfSlope(docs)
      .select($"lang", $"zipf_slope", $"n_types", $"n_tokens")
      .as[(String, Option[Double], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en")._2.exists(s => math.abs(s + 1.0) < 1e-6))
    assert(got("en")._3 === 4L && got("en")._4 === 25L)
    assert(got("solo")._2.isEmpty && got("solo")._3 === 1L)
  }

  test("perplexityBuckets: ntile arithmetic matches SQL ntile " +
    "(first n mod b buckets one wider), per language") {
    val docs = Seq(
      // 7 en docs with 2+ tokens -> buckets sized 3,2,2
      (1L, "en", "aa bb"), (2L, "en", "aa bb"), (3L, "en", "aa bb"),
      (4L, "en", "aa cc"), (5L, "en", "cc dd"), (6L, "en", "dd ee"),
      (7L, "en", "ee ff"),
      // 2 de docs -> buckets 1 and 2 (q=0 path: every rank <= r)
      (8L, "de", "xx yy"), (9L, "de", "xx yy"),
      // one-token doc: no bigrams, excluded
      (10L, "en", "zz")
    ).toDF("doc_id", "lang", "text")
    val got = graft.operators.Relevance.perplexityBuckets(docs)
    val viaSql = {
      val s = graft.operators.Relevance.lmQualityScore(docs)
        .select($"doc_id", $"avg_nll")
        .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      s.select($"doc_id", $"lang", $"avg_nll",
        ntile(3).over(Window.partitionBy($"lang")
          .orderBy($"avg_nll", $"doc_id")).as("ppl_bucket"))
    }
    assert(got.select($"doc_id", $"lang", $"avg_nll", $"ppl_bucket")
      .as[(Long, String, Double, Int)].collect().toSet ===
      viaSql.as[(Long, String, Double, Int)].collect().toSet)
    assert(got.filter($"doc_id" === 10L).isEmpty)
  }
}
