package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamHeavyHitters

class StreamHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming MG candidates: every true phi-heavy token is in the " +
    "live summary after each batch, and the batch confirm pass over " +
    "the closed input equals the batch operator") {
    implicit val sql = spark.sqlContext
    // 30 'a' + 12 'b' dominate; c..j are one-off noise spread over
    // batches so MG must survive decrements and merges
    val batch1 = Seq("a a a a a a a a a a b b b", "c d e a a a a a")
    val batch2 = Seq("a a a a a a a b b b b b f g", "a a a a a a a a a a h i j b b b b")
    val all = batch1 ++ batch2

    val in = MemoryStream[String]
    val out = StreamHeavyHitters.candidates(
      in.toDF().toDF("text"), col("text"), capacity = 8)
    val q = out.writeStream.format("memory").queryName("st_hh")
      .outputMode("complete").start()
    try {
      val phi = 0.2
      def check(closed: Seq[String]): Unit = {
        val cands = spark.table("st_hh")
          .select($"token").as[String].collect().toSet
        val n = closed.flatMap(_.split("\\s+")).count(_.nonEmpty)
        val truth = closed.flatMap(_.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).filter(_._2.size > phi * n).keySet
        assert(truth.subsetOf(cands),
          s"missing heavy hitters: ${truth -- cands}")
      }
      in.addData(batch1); q.processAllAvailable(); check(batch1)
      in.addData(batch2); q.processAllAvailable(); check(all)

      // offline confirm: exact recount of the live candidate set over
      // the closed input == the batch operator end-to-end
      val cands = spark.table("st_hh").select($"token")
      val docs = all.toDF("text")
      val n = all.flatMap(_.split("\\s+")).count(_.nonEmpty).toLong
      val confirmed = graft.operators.Vocab.tokens(docs, $"text")
        .join(cands, "token")
        .groupBy($"token").agg(count(lit(1)).as("n_occurrences"))
        .filter($"n_occurrences" > lit(0.2) * n)
        .as[(String, Long)].collect().toSet
      val batch = graft.operators.Vocab
        .heavyHitters(docs, $"text", phi = 0.2, capacity = 8)
        .as[(String, Long)].collect().toSet
      assert(confirmed === batch)
      assert(confirmed.map(_._1) === Set("a", "b"))
    } finally q.stop()
  }

  test("streaming MG state stays capacity-bounded: the summary row " +
    "never exceeds capacity entries across many batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamHeavyHitters.candidates(
      in.toDF().toDF("text"), col("text"), capacity = 4)
    val q = out.writeStream.format("memory").queryName("st_hh_cap")
      .outputMode("complete").start()
    try {
      // 40 distinct tokens across 4 batches — the summary must stay ≤ 4
      for (b <- 0 until 4) {
        in.addData(Seq((0 until 10).map(i => s"t${b}_$i").mkString(" ")))
        q.processAllAvailable()
        assert(spark.table("st_hh_cap").count() <= 4L)
      }
    } finally q.stop()
  }
}
