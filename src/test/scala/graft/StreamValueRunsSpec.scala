package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamValueRuns

class StreamValueRunsSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming run collapse: sealed runs equal the batch operator's " +
    "closed runs on an out-of-order multi-batch stream") {
    implicit val sql = spark.sqlContext
    val events = Seq(
      // user 1: x x y x — the second x arrives a batch late and must
      // still extend run 0 rather than open a new run
      (1L, t("2024-01-01 10:00:02"), 2L, "y"),
      (1L, t("2024-01-01 10:00:00"), 1L, "x"),
      // --- batch 2 ---
      (1L, t("2024-01-01 10:00:01"), 3L, "x"),
      (1L, t("2024-01-01 10:00:03"), 4L, "x"),
      (2L, t("2024-01-01 10:00:00"), 10L, "p")
    )
    val flush = (99L, t("2024-01-01 11:00:00"), 999L, "zz")

    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamValueRuns.valueRuns(
      in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("st_runs")
      .outputMode("append").start()
    try {
      in.addData(events.take(2)); q.processAllAvailable()
      in.addData(events.drop(2)); q.processAllAvailable()
      in.addData(flush); q.processAllAvailable()

      val got = spark.table("st_runs").filter($"user_id" < 90L)
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet

      // batch ground truth, keeping CLOSED runs only (all but each
      // user's last run — the stream can never prove the tail over)
      val batch = graft.analytics.Funnels.valueRuns(
        (events :+ flush).toDF("user_id", "ts", "event_id", "event_type"))
        .filter($"key" < 90L)
      val lastIdx = batch.groupBy($"key")
        .agg(max($"run_idx").as("last_idx"))
      val closed = batch.join(lastIdx, Seq("key"))
        .filter($"run_idx" < $"last_idx")
        .select($"key", $"run_idx", $"value",
          unix_micros($"start_ts").as("s"),
          unix_micros($"end_ts").as("e"), $"n_events")
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
      assert(got === closed)
      // run 0 absorbed the late x@01 arrival: 2 events in one run
      assert(got.exists(r => r._1 == 1L && r._3 == "x" && r._6 == 2L
        && r._2 == 0L))
    } finally q.stop()
  }
}
