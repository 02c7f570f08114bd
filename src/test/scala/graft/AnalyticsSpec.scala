package graft

import org.apache.spark.sql.functions._

import graft.analytics.RegisterAnalytics

/** The two-level tumble→slide decomposition in slidingCounts is only valid
  * when the slide divides the window EXACTLY; these cases pin the guard
  * against the round-2 advice shapes (day-field intervals and sub-second
  * slides, both of which a seconds-only microseconds check misjudged). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(off: Int) = new java.sql.Timestamp(1700000000000L + off * 1000L)

  /** Direct single-level reference formulation. */
  private def direct(events: org.apache.spark.sql.DataFrame,
      w: String, s: String) =
    events.groupBy(window($"t", w, s).as("w"), $"k".as("key"))
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), $"key", $"n")

  private def run(events: org.apache.spark.sql.DataFrame,
      w: String, s: String): Set[(String, String, Long)] =
    RegisterAnalytics.slidingCounts(events, $"t", $"k", w, s)
      .as[(String, String, Long)].collect().toSet

  private val events = (0 until 50)
    .map(i => (ts(i * 7 % 300), s"u${i % 3}")).toDF("t", "k")

  test("sliding counts: divisible shape (60s/6s) matches single-level") {
    assert(run(events, "60 seconds", "6 seconds") ===
      direct(events, "60 seconds", "6 seconds")
        .as[(String, String, Long)].collect().toSet)
  }

  test("sliding counts: sub-second slide that floors to a divisor " +
    "(8s/4500ms) must not take the two-level plan") {
    // pre-fix: 4500 ms floored to 4 s and 8 % 4 == 0 chose two-level on
    // a shape where the slide does NOT divide the window
    assert(run(events, "8 seconds", "4500 milliseconds") ===
      direct(events, "8 seconds", "4500 milliseconds")
        .as[(String, String, Long)].collect().toSet)
  }

  test("sliding counts: sub-second slide that DOES divide " +
    "(5s/2500ms) is correct (newly eligible for two-level)") {
    assert(run(events, "5 seconds", "2500 milliseconds") ===
      direct(events, "5 seconds", "2500 milliseconds")
        .as[(String, String, Long)].collect().toSet)
  }

  test("sliding counts: day-field window ('1 day'/'25 minutes') must " +
    "not take the two-level plan") {
    // pre-fix: '1 day' has microseconds == 0, so w = 0 and 0 % s == 0
    // passed for ANY slide
    assert(run(events, "1 day", "25 minutes") ===
      direct(events, "1 day", "25 minutes")
        .as[(String, String, Long)].collect().toSet)
  }

  test("sliding counts: day-field window with a dividing slide " +
    "('1 day'/'6 hours') is still two-level and correct") {
    assert(run(events, "1 day", "6 hours") ===
      direct(events, "1 day", "6 hours")
        .as[(String, String, Long)].collect().toSet)
  }

  test("sessionize: gap splits, session numbering, ties share a " +
    "session, sub-second gaps honored, null rows dropped") {
    import graft.analytics.Sessionize
    // build via micros directly to exercise sub-second boundaries
    def tsUs(us: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(us / 1000)
      ts.setNanos((us % 1000000).toInt * 1000)
      ts
    }
    val base = 1700000000000000L // epoch micros
    val events = Seq(
      // user a: 3 events within gap, then a 10s+1us jump -> 2 sessions
      ("a", tsUs(base)), ("a", tsUs(base + 5000000L)),
      ("a", tsUs(base + 9000000L)), ("a", tsUs(base + 19000001L)),
      // user b: tie at the same instant then exactly-at-gap (no split:
      // gap is strict >)
      ("b", tsUs(base)), ("b", tsUs(base)), ("b", tsUs(base + 10000000L)),
      // null rows dropped
      (null.asInstanceOf[String], tsUs(base)))
      .toDF("u", "t")
    val got = Sessionize.sessions(events, col("u"), col("t"), gapSec = 10L)
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.keySet === Set(("a", 1L), ("a", 2L), ("b", 1L)))
    assert(got(("a", 1L))._1 === 3L)
    assert(got(("a", 2L)) === ((1L, tsUs(base + 19000001L),
      tsUs(base + 19000001L))))
    // tie rows share session 1; exactly-10s gap does NOT split
    assert(got(("b", 1L)) === ((3L, tsUs(base), tsUs(base + 10000000L))))
  }
}
