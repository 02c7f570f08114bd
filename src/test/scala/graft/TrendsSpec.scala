package graft

import java.sql.Timestamp

import graft.analytics.Trends

class TrendsSpec extends SparkTestBase {
  import spark.implicits._

  private def dayTs(day: Long, off: Long = 0L) =
    new Timestamp(day * 86400000L + off)

  test("dailyCountAnomaly: z from exact moments; flat/singleton " +
    "series yield null z") {
    val events = Seq(
      // type a: counts 1, 2, 3 on days 0, 1, 2
      ("a", dayTs(0)),
      ("a", dayTs(1)), ("a", dayTs(1, 1000)),
      ("a", dayTs(2)), ("a", dayTs(2, 1000)), ("a", dayTs(2, 2000)),
      // type b: one day only -> variance 0 -> null z
      ("b", dayTs(5)), ("b", dayTs(5, 1000))
    ).toDF("event_type", "ts")
    val got = Trends.dailyCountAnomaly(events)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val mean = 2.0
    val variance = 14.0 / 3.0 - mean * mean
    def z(n: Long) = (n - mean) / math.sqrt(variance)
    assert(got(("a", 0L)) === ((1L, Some(z(1)))))
    assert(got(("a", 1L)) === ((2L, Some(z(2)))))
    assert(got(("a", 2L)) === ((3L, Some(z(3)))))
    assert(got(("b", 5L)) === ((2L, None)))
  }

  test("dailyTrend: exact least-squares line; single-day series " +
    "yields null slope/intercept") {
    val events = Seq(
      // type a: y = x - 9 over days 10, 11, 12 (counts 1, 2, 3)
      ("a", dayTs(10)),
      ("a", dayTs(11)), ("a", dayTs(11, 1000)),
      ("a", dayTs(12)), ("a", dayTs(12, 1000)), ("a", dayTs(12, 2000)),
      ("b", dayTs(3))
    ).toDF("event_type", "ts")
    val got = Trends.dailyTrend(events)
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((3L, Some(1.0), Some(-9.0))))
    assert(got("b") === ((1L, None, None)))
  }
}
