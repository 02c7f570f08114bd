package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamFunnel

class StreamFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def usOf(s: String): Long = {
    val i = t(s).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("streaming funnel equals batch funnelUsers on an out-of-order " +
    "multi-batch stream; stage advances emit exactly once") {
    implicit val sql = spark.sqlContext
    val events = Seq(
      // user 1 completes — but the view arrives AFTER the click in
      // stream order (cross-batch, inside the watermark): the replay
      // must still find the chain view@00 → click@10 → purchase@20
      (1L, t("2024-01-01 10:00:10"), 2L, "click"),
      (2L, t("2024-01-01 10:00:01"), 10L, "click"),
      // --- batch 2 ---
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (1L, t("2024-01-01 10:00:20"), 4L, "purchase"),
      // user 2: click precedes its view — never starts
      (2L, t("2024-01-01 10:00:02"), 11L, "purchase"),
      // user 3: view only
      (3L, t("2024-01-01 10:00:03"), 20L, "view")
    )
    val flush = (99L, t("2024-01-01 11:00:00"), 999L, "view")

    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamFunnel.funnel(
      in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      Seq("view", "click", "purchase"), watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("st_funnel")
      .outputMode("append").start()
    try {
      in.addData(events.take(2)); q.processAllAvailable()
      in.addData(events.drop(2)); q.processAllAvailable()
      in.addData(flush); q.processAllAvailable()

      val got = spark.table("st_funnel")
        .filter($"user_id" < 90L)
        .as[(Long, Int, Long)].collect()
      assert(got.length === got.distinct.length)
      assert(got.toSet === Set(
        (1L, 1, usOf("2024-01-01 10:00:00")),
        (1L, 2, usOf("2024-01-01 10:00:10")),
        (1L, 3, usOf("2024-01-01 10:00:20")),
        (3L, 1, usOf("2024-01-01 10:00:03"))))

      // agreement with the batch operator: furthest stage and the
      // first/last chain times per user
      val batch = graft.analytics.Funnels.funnelUsers(
        (events :+ flush).toDF("user_id", "ts", "event_id", "event_type"),
        Seq("view", "click", "purchase"))
        .filter($"user_id" < 90L)
        .as[(Long, Int, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val byUser = got.groupBy(_._1)
      for ((u, (reached, first, last)) <- batch) {
        val rows = byUser.getOrElse(u, Array.empty[(Long, Int, Long)])
        assert(rows.length === reached, s"user $u")
        if (reached > 0) {
          assert(rows.minBy(_._2)._3 === first.get, s"user $u first")
          assert(rows.maxBy(_._2)._3 === last.get, s"user $u last")
        }
      }
    } finally q.stop()
  }
}
