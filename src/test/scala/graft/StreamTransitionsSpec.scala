package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamTransitions

class StreamTransitionsSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("watermark-ordered replay: out-of-order multi-batch stream " +
    "emits exactly the batch transitions, each pair once") {
    implicit val sql = spark.sqlContext
    val events = Seq(
      // user 1: batch 1 delivers b before a (in-batch disorder); the
      // c at 10:00:05 arrives a whole batch later and must still slot
      // between a and b (cross-batch disorder inside the watermark)
      (1L, t("2024-01-01 10:00:10"), 2L, "b"),
      (1L, t("2024-01-01 10:00:00"), 1L, "a"),
      (2L, t("2024-01-01 10:00:05"), 10L, "x"),
      // --- batch 2 ---
      (1L, t("2024-01-01 10:00:05"), 3L, "c"),
      (1L, t("2024-01-01 10:00:20"), 4L, "d"),
      (2L, t("2024-01-01 10:00:06"), 11L, "y"),
      // user 3: equal timestamps — event_id breaks the tie
      (3L, t("2024-01-01 10:00:07"), 21L, "p"),
      (3L, t("2024-01-01 10:00:07"), 20L, "q")
    )
    val flush = (99L, t("2024-01-01 11:00:00"), 999L, "zz")

    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamTransitions.transitions(
      in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("st_trans")
      .outputMode("append").start()
    try {
      in.addData(events.take(3)); q.processAllAvailable()
      in.addData(events.drop(3)); q.processAllAvailable()
      in.addData(flush); q.processAllAvailable()

      val got = spark.table("st_trans")
        .select($"user_id", $"from_type", $"to_type", $"at_us")
        .as[(Long, String, String, Long)].collect()
      // each transition exactly once
      assert(got.length === got.distinct.length)
      assert(got.toSet === Set(
        (1L, "a", "c", usOf("2024-01-01 10:00:05")),
        (1L, "c", "b", usOf("2024-01-01 10:00:10")),
        (1L, "b", "d", usOf("2024-01-01 10:00:20")),
        (2L, "x", "y", usOf("2024-01-01 10:00:06")),
        (3L, "q", "p", usOf("2024-01-01 10:00:07"))))

      // aggregated, the stream equals the batch operator on the same
      // events (the flush sentinel has one event and no transitions)
      val batch = graft.analytics.Funnels.transitions(
        (events :+ flush).toDF("user_id", "ts", "event_id", "event_type"))
        .as[(String, String, Long)].collect().toSet
      val streamAgg = spark.table("st_trans")
        .groupBy($"from_type", $"to_type")
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      assert(streamAgg === batch)
    } finally q.stop()
  }

  private def usOf(s: String): Long = {
    val i = t(s).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
}
