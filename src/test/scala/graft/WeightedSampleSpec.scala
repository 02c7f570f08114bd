package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Weighted reservoir sampling (Efraimidis–Spirakis A-ES, x113). */
class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private def hashUnitRef(key: String): Double = {
    val P = 1000000007L
    var h = 0L
    for (c <- key) h = (h * 131 + c.toLong) % P
    val h1 = (h * 1103515245L + 12345L) % P
    val h2 = (h1 * 69069L + 1L) % P
    (h2 + 1).toDouble / 1000000008.0
  }

  test("es_key matches the driver reference; k per group; " +
    "deterministic under repartitioning") {
    val rows = (1L to 300L).map(i =>
      (i, s"s${i % 3}", 10.0 + (i % 7) * 50.0))
    val df = rows.toDF("id", "grp", "w")
    val got = Corpus.weightedSamplePerGroup(df, col("grp"), col("id"),
      col("w"), k = 5)
      .select($"grp", $"id", $"es_key")
      .as[(String, Long, Double)].collect()
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    // es_key replays: round(ln(u)/w, 6)
    val wOf = rows.map(r => r._1 -> r._3).toMap
    for ((_, id, k) <- got) {
      val want = BigDecimal(math.log(hashUnitRef(id.toString)) / wOf(id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(k - want) < 1e-9, s"es_key for id=$id")
    }
    // exact top-k of the reference ordering per group
    val wantSel = rows
      .map { case (id, g, w) =>
        (g, id, math.log(hashUnitRef(id.toString)) / w) }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(5) }
      .map(x => (x._1, x._2)).toSet
    assert(got.map(x => (x._1, x._2)).toSet === wantSel)
    // partitioning invariance (both rank routes)
    val again = Corpus.weightedSamplePerGroup(df.repartition(13),
      col("grp"), col("id"), col("w"), k = 5, numRanges = 4)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(again === got.map(x => (x._1, x._2)).toSet)
  }

  test("selection probability is weight-monotone in aggregate: heavy " +
    "rows win far more slots than light rows at equal count") {
    // one group, 1000 rows: half weight 1, half weight 50 — A-ES picks
    // heavy rows for the vast majority of 100 slots
    val df = (1L to 1000L)
      .map(i => (i, "g", if (i % 2 == 0) 50.0 else 1.0))
      .toDF("id", "grp", "w")
    val kept = Corpus.weightedSamplePerGroup(df, col("grp"), col("id"),
      col("w"), k = 100).select($"id").as[Long].collect()
    val heavy = kept.count(_ % 2 == 0)
    assert(heavy > 85, s"expected heavy-weight dominance, got $heavy/100")
  }

  test("null keys and groups excluded; k must be positive") {
    val df = Seq((Some(1L), Option("g"), 1.0),
      (None, Option("g"), 1.0), (Some(2L), None, 1.0))
      .toDF("id", "grp", "w")
    assert(Corpus.weightedSamplePerGroup(df, col("grp"), col("id"),
      col("w"), k = 10).count() === 1)
    intercept[IllegalArgumentException] {
      Corpus.weightedSamplePerGroup(df, col("grp"), col("id"),
        col("w"), k = 0)
    }
  }
}
