package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Corpus
import graft.streaming.StreamQualityGate

/** Streaming quality gate mirrors the batch percentileGate: cutoffs
  * learned from a batch reference, applied to the stream as a pure
  * projection. On a tie-free reference, streaming the reference
  * through the gate keeps exactly the batch survivors. */
class StreamQualityGateSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("gating the reference stream reproduces batch percentileGate " +
    "row-for-row (tie-free scores); batching is irrelevant") {
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"source".as[String],
        $"text".as[String]).collect().toSeq
    // tie-free score: the x8 heuristic plus a tiny id-keyed epsilon
    def score = TextAnalysis.qualityScore(col("text")) +
      col("doc_id") / lit(1e9)

    val reference = docs.toDF("doc_id", "source", "text")
    val want = Corpus.percentileGate(reference, score, "source",
      "doc_id", dropFraction = 0.25, scoreName = "q")
      .select($"doc_id").as[Long].collect().toSet
    assert(want.nonEmpty && want.size < docs.size)

    val cutoffs = StreamQualityGate.thresholds(reference, score,
      "source", "doc_id", dropFraction = 0.25)
    val in = MemoryStream[(Long, String, String)]
    val gated = StreamQualityGate.gate(
      in.toDF().toDF("doc_id", "source", "text"), cutoffs, score,
      "source", scoreName = "q")
    assert(gated.columns.toSeq ===
      Seq("doc_id", "source", "text", "q"))
    val q = gated.writeStream.format("memory").queryName("st_qgate")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.table("st_qgate").select($"doc_id")
        .as[Long].collect().toSet
      assert(got === want)
    } finally q.stop()
  }

  test("unknown groups pass ungated; empty cutoff table gates nothing; " +
    "oversized cutoff table and score-name collisions rejected") {
    implicit val sql = spark.sqlContext
    val reference = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0)
    ).toDF("doc_id", "grp", "s")
    val cutoffs = StreamQualityGate.thresholds(reference, col("s"),
      "grp", "doc_id", dropFraction = 0.25)
    // 4 rows, drop 25% -> boundary rank 1 -> cutoff 1.0
    assert(cutoffs.as[(String, Double)].collect().toSet ===
      Set(("a", 1.0)))

    val in = MemoryStream[(Long, String, Double)]
    val gated = StreamQualityGate.gate(
      in.toDF().toDF("doc_id", "grp", "s"), cutoffs, col("s"), "grp")
    val q = gated.writeStream.format("memory").queryName("st_qgate2")
      .outputMode("append").start()
    try {
      in.addData(Seq((10L, "a", 1.0), (11L, "a", 1.5),
        (12L, "zzz", -99.0))) // unknown group: passes despite low score
      q.processAllAvailable()
      val got = spark.table("st_qgate2").select($"doc_id")
        .as[Long].collect().toSet
      assert(got === Set(11L, 12L))
    } finally q.stop()

    // empty cutoffs (nothing droppable): everything passes
    val none = StreamQualityGate.thresholds(
      reference.limit(2), col("s"), "grp", "doc_id",
      dropFraction = 0.25) // floor(0.25*2) = 0 -> no boundary row
    assert(none.count() === 0)
    val in2 = MemoryStream[(Long, String, Double)]
    val all = StreamQualityGate.gate(
      in2.toDF().toDF("doc_id", "grp", "s"), none, col("s"), "grp")
    val q2 = all.writeStream.format("memory").queryName("st_qgate3")
      .outputMode("append").start()
    try {
      in2.addData(Seq((20L, "a", -5.0))); q2.processAllAvailable()
      assert(spark.table("st_qgate3").count() === 1)
    } finally q2.stop()

    val e1 = intercept[IllegalArgumentException] {
      StreamQualityGate.gate(in2.toDF().toDF("doc_id", "grp", "s"),
        cutoffs, col("s"), "grp", maxGroups = 0)
    }
    assert(e1.getMessage.contains("maxGroups") ||
      e1.getMessage.contains("cap"))
    val e2 = intercept[IllegalArgumentException] {
      StreamQualityGate.gate(in2.toDF().toDF("doc_id", "grp", "score"),
        cutoffs, col("score"), "grp")
    }
    assert(e2.getMessage.contains("score"))
  }
}
