package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1 (registration analytics) semantics as pure batch transforms
  * (reference RegisterStreaming.scala:75-101), generalized over any
  * event table with a timestamp and a key column.
  *
  * Scale notes: the sliding-window count is a single hash aggregate after a
  * generator (each row lands in window/slide buckets) — shuffle on
  * (window, key) only; the cumulative count is a running sum over per-day
  * partial aggregates, so the analytic window function sorts only
  * #days × #keys rows, never raw events.
  */
object RegisterAnalytics {

  /** Keyed counts over sliding event-time windows (reference
    * reduceByKeyAndWindow, RegisterStreaming.scala:91 — upgraded from
    * processing-time to event-time). Window start rendered as a string so
    * results are engine-portable.
    *
    * When the slide divides the window (the reference's 60s/6s shape),
    * aggregation runs two-level: tumbling partials at slide width first,
    * then the window/slide generator over the PARTIALS. The generator
    * emits window÷slide rows per input — running it over raw events
    * multiplies the corpus by that factor before any combining; over
    * tumble partials it touches #tumbles×#keys rows. Identical results:
    * every event in a tumble belongs to exactly the sliding windows
    * containing that tumble. */
  def slidingCounts(events: DataFrame, ts: Column, key: Column,
      windowDur: String, slideDur: String): DataFrame = {
    // Exact total microseconds (days are a separate CalendarInterval field;
    // months have no fixed length, so any month component disqualifies the
    // two-level plan). The decomposition below is only sound when the slide
    // divides the window EXACTLY — sub-second remainders count.
    def toUs(d: String): Option[Long] = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .fromIntervalString(d)
      if (iv.months != 0) None
      else Some(iv.days * 86400000000L + iv.microseconds)
    }
    val divides = (toUs(windowDur), toUs(slideDur)) match {
      case (Some(wUs), Some(sUs)) => sUs > 0 && wUs % sUs == 0
      case _ => false
    }
    val agged =
      if (divides) {
        events
          .groupBy(window(ts, slideDur).as("tw"), key.as("key"))
          .agg(count(lit(1)).as("pn"))
          .groupBy(window(col("tw.start"), windowDur, slideDur).as("w"),
            col("key"))
          .agg(sum(col("pn")).as("n"))
      } else
        events
          .groupBy(window(ts, windowDur, slideDur).as("w"), key.as("key"))
          .agg(count(lit(1)).as("n"))
    agged.select(
      date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("key"),
      col("n"))
  }

  /** Cumulative per-key totals by day (reference updateStateByKey,
    * RegisterStreaming.scala:95-101, as a batch analog): aggregate to
    * (day, key) partials first, then running-sum the partials. */
  def cumulativeDaily(events: DataFrame, ts: Column, key: Column): DataFrame = {
    val daily = events
      .groupBy(date_format(ts, "yyyy-MM-dd").as("day"), key.as("key"))
      .agg(count(lit(1)).as("registrations"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    daily.select(
      col("day"),
      col("key"),
      sum(col("registrations")).over(w).as("cum_registrations"))
  }
}
