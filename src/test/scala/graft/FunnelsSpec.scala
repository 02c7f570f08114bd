package graft

import java.sql.Timestamp

import graft.analytics.Funnels
import org.apache.spark.sql.functions.col

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

  test("mergeRuns: merge of a cutoff split equals the full rebuild — " +
    "open-run extension, value change, new key, untouched key") {
    val events = Seq(
      // key 1: history (x,x,y), delta (y,z) -> y-run EXTENDS, z appends
      (1L, ts(0), "x", 1L), (1L, ts(1), "x", 2L), (1L, ts(2), "y", 3L),
      (1L, ts(10), "y", 4L), (1L, ts(11), "z", 5L),
      // key 2: history (p), delta (q,p) -> no merge, two appended runs
      (2L, ts(0), "p", 6L), (2L, ts(10), "q", 7L), (2L, ts(11), "p", 8L),
      // key 3: untouched by the delta
      (3L, ts(0), "a", 9L), (3L, ts(1), "b", 10L),
      // key 4: delta-only (new key), with an internal run split
      (4L, ts(10), "m", 11L), (4L, ts(11), "m", 12L), (4L, ts(12), "n", 13L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val cut = ts(5)
    val merged = Funnels.mergeRuns(
      Funnels.valueRuns(events.filter($"ts" < cut)),
      events.filter($"ts" >= cut))
    val full = Funnels.valueRuns(events)
    val cols = Seq("key", "run_idx", "value", "start_ts", "end_ts",
      "n_events").map(col)
    assert(merged.select(cols: _*).collect().toSet ===
      full.select(cols: _*).collect().toSet)
    // the extended run carries history start, delta end, summed count
    val r1 = merged.filter($"key" === 1L && $"run_idx" === 1L)
      .select($"value", $"start_ts", $"end_ts", $"n_events")
      .collect().head
    assert(r1.getString(0) === "y" && r1.getTimestamp(1) === ts(2) &&
      r1.getTimestamp(2) === ts(10) && r1.getLong(3) === 2L)
  }

  test("mergeRuns: empty delta returns history; empty history returns " +
    "the delta's runs") {
    val events = Seq((1L, ts(0), "x", 1L), (1L, ts(1), "y", 2L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val runs = Funnels.valueRuns(events)
    val none = events.filter($"event_id" < 0L)
    val cols = Seq("key", "run_idx", "value", "start_ts", "end_ts",
      "n_events").map(col)
    assert(Funnels.mergeRuns(runs, none).select(cols: _*)
      .collect().toSet === runs.select(cols: _*).collect().toSet)
    assert(Funnels.mergeRuns(Funnels.valueRuns(none), events)
      .select(cols: _*).collect().toSet ===
      runs.select(cols: _*).collect().toSet)
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
