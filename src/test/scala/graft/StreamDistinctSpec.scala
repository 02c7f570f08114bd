package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.HllExprs
import graft.streaming.StreamDistinct

/** Streaming windowed HLL sketches: sealed windows carry estimates
  * within the x62 tolerance of exact distinct counts, and the emitted
  * sketches are themselves mergeable relations (rollups without
  * replaying the stream). */
class StreamDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sealed windows: estimate within max(5%, 5) of exact; emitted " +
    "sketches roll up by register merge to the global estimate") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val out = StreamDistinct.windowedDistinct(
      in.toDF().toDF("ts", "etype", "uid"),
      key = col("uid"), grp = col("etype"),
      eventTimeCol = "ts", windowDur = "10 minutes", delay = "5 minutes",
      grpOut = "etype")
    val q = out.writeStream.format("memory").queryName("st_hll")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(97)
      // window 1 (10:00-10:10): two event types, overlapping user sets
      val w1 = (0 until 400).map(_ => (t("2024-01-01 10:03:00"),
        if (rnd.nextBoolean()) "click" else "view",
        rnd.nextInt(120).toLong))
      // window 2 (10:10-10:20): a smaller burst
      val w2 = (0 until 100).map(_ => (t("2024-01-01 10:12:00"),
        "click", rnd.nextInt(30).toLong))
      in.addData(w1)
      in.addData(w2)
      q.processAllAvailable()
      // advance the watermark far enough to seal both windows
      in.addData(Seq((t("2024-01-01 11:00:00"), "late", 1L)))
      q.processAllAvailable()

      val rows = spark.table("st_hll")
        .select($"window_start", $"etype", $"n_approx")
        .as[(Timestamp, String, Long)].collect()
      val all = w1 ++ w2
      def exact(ws: String, et: String): Long = {
        val (lo, hi) = (t(ws), new Timestamp(t(ws).getTime + 600000L))
        all.filter(e => e._2 == et && !e._1.before(lo) && e._1.before(hi))
          .map(_._3).distinct.size.toLong
      }
      assert(rows.nonEmpty)
      val sealedKeys = rows.map(r => (r._1.toString, r._2)).toSet
      assert(sealedKeys.contains(("2024-01-01 10:00:00.0", "click")))
      assert(sealedKeys.contains(("2024-01-01 10:10:00.0", "click")))
      rows.foreach { case (ws, et, est) =>
        val ex = exact(ws.toString, et)
        assert(math.abs(est - ex) <= math.max(0.05 * ex, 5.0),
          s"window=$ws etype=$et est=$est exact=$ex")
      }

      // rollup: merging the EMITTED sketches for window 1 estimates the
      // union of both event types' users — no stream replay
      val merged = spark.table("st_hll")
        .filter($"window_start" === t("2024-01-01 10:00:00"))
        .agg(round(HllExprs.hllEstimate(
          HllExprs.hllMerge($"sketch"))).cast("long"))
        .as[Long].collect().head
      val exactUnion = w1.map(_._3).distinct.size.toLong
      assert(math.abs(merged - exactUnion) <=
        math.max(0.05 * exactUnion, 5.0), s"$merged vs $exactUnion")
    } finally q.stop()
  }
}
