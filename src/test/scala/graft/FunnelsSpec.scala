package graft

import java.sql.Timestamp

import graft.analytics.Funnels

class FunnelsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("funnel: strictly-increasing chain, earliest-occurrence greedy, " +
    "zero-count stages stay visible") {
    val events = Seq(
      // user 1 completes in order
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      // user 2: click BEFORE view never counts; no click after the view
      (2L, ts(0), "click"), (2L, ts(5), "view"),
      // user 3: click tied to the view timestamp is NOT strictly after
      (3L, ts(0), "view"), (3L, ts(0), "click"),
      // user 4: no view at all — reaches stage 0
      (4L, ts(0), "purchase"), (4L, ts(1), "click"),
      // user 5: view then click; purchase only before the click
      (5L, ts(0), "purchase"), (5L, ts(1), "view"), (5L, ts(2), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels
      .funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "view", 4L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("funnel: the greedy earliest chain matches the staged-min " +
    "recurrence (t1=view@0, t2=click@1, t3=purchase@3)") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"),
      (1L, ts(3), "purchase"), (1L, ts(5), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "view", 1L), (2L, "click", 1L),
      (3L, "purchase", 1L)))
  }

  test("funnelUsers: earliest-chain first/last times in µs; " +
    "non-starters carry nulls") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      (2L, ts(5), "click"), // never stage 1
      (3L, ts(7), "view")   // stage 1 only: first == last
    ).toDF("user_id", "ts", "event_type")
    val got = graft.analytics.Funnels
      .funnelUsers(events, Seq("view", "click", "purchase"))
      .as[(Long, Int, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val us0 = 1700000000000L * 1000L
    assert(got(1L) === ((3, Some(us0), Some(us0 + 20000000L))))
    assert(got(2L) === ((0, None, None)))
    assert(got(3L) === ((1, Some(us0 + 7000000L), Some(us0 + 7000000L))))
  }

  test("transitions: adjacent pairs per user in (ts, id) order; ties " +
    "broken by id; null fields dropped") {
    val events = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "a", 3L),
      // user 2: same-ts events — id order decides adjacency (b→c, not c→b)
      (2L, ts(0), "a", 4L), (2L, ts(1), "b", 5L), (2L, ts(1), "c", 6L),
      // single-event user: no transitions
      (3L, ts(0), "z", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.analytics.Funnels.transitions(events)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
  }

  test("valueRuns: consecutive same values collapse; change restarts " +
    "the run; id breaks timestamp ties") {
    val events = Seq(
      (1L, ts(0), "x", 1L), (1L, ts(1), "x", 2L), (1L, ts(2), "y", 3L),
      (1L, ts(3), "x", 4L), // x again -> NEW run (not merged with run 0)
      // user 2: tie at ts(0) — id order makes the runs (p), (q)
      (2L, ts(0), "p", 5L), (2L, ts(0), "q", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.analytics.Funnels.valueRuns(events)
      .select($"key", $"run_idx", $"value", $"n_events")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, "x", 2L), (1L, 1L, "y", 1L), (1L, 2L, "x", 1L),
      (2L, 0L, "p", 1L), (2L, 1L, "q", 1L)))
    // start/end span the run
    val spans = graft.analytics.Funnels.valueRuns(events)
      .filter($"key" === 1L && $"run_idx" === 0L)
      .select($"start_ts", $"end_ts").collect().head
    assert(spans.getTimestamp(0) === ts(0) && spans.getTimestamp(1) === ts(1))
  }

  test("retention: integer-week cohorts and offsets, distinct users") {
    val day = 86400L
    val events = Seq(
      // user 1 first seen day 0: active weeks 0 and 2 (twice, distinct)
      (1L, ts(0)), (1L, ts(14 * day)), (1L, ts(15 * day)),
      // user 2 first seen day 1 (same absolute cohort week): week 0 only
      (2L, ts(1 * day)),
      // user 3 first seen day 8 — next cohort week, offset 1 active
      (3L, ts(8 * day)), (3L, ts(16 * day))
    ).toDF("user_id", "ts")
    val base = 1700000000000L / 1000 / day // days since epoch at ts(0)
    val w0 = base / 7
    val w3 = (base + 8) / 7
    val got = Funnels.retention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((w0, 0L, 2L), (w0, 2L, 1L), (w3, 0L, 1L),
      (w3, 1L, 1L)))
  }
}
