package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamCurate, StreamQualityGate}

/** The composed streaming curation pipeline: each stage's contract
  * holds through the composition — duplicates drop first (cross-batch),
  * contaminated docs next, then the per-group quality gate. */
class StreamCurateSpec extends SparkTestBase {
  import spark.implicits._

  test("dedup, decontamination and quality gate compose in one " +
    "streaming query; each stage's drops are attributable") {
    implicit val sql = spark.sqlContext
    val benchText = "the secret benchmark passage that must not leak " * 3
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")

    // reference for cutoffs: group g scores 1..4 -> cutoff 1.0 (drop 25%)
    val reference = Seq(
      (900L, "g", 1.0), (901L, "g", 2.0), (902L, "g", 3.0), (903L, "g", 4.0)
    ).toDF("doc_id", "grp", "s")
    val cutoffs = StreamQualityGate.thresholds(reference, col("s"),
      "grp", "doc_id", dropFraction = 0.25)

    // score = value carried on the row (stands in for a text heuristic)
    val in = MemoryStream[(Long, String, String, Double)]
    val out = StreamCurate.curate(
      in.toDF().toDF("doc_id", "grp", "text", "s"),
      bench, cutoffs, col("s"), "grp",
      minSharedGrams = 20, n = 5, scoreName = "q")
    val q = out.writeStream.format("memory").queryName("st_curate")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, "g", "a clean and entirely original first document", 3.0),
        (2L, "g", "prefix " + benchText + " suffix", 3.0), // contaminated
        (3L, "g", "another clean but low quality document", 0.5) // gated
      ))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of doc 1 (dropped by dedup even
      // with a passing score) + one fresh survivor
      in.addData(Seq(
        (4L, "g", "a clean and entirely original first document", 3.0),
        (5L, "g", "a fresh survivor document for the second batch", 2.5)
      ))
      q.processAllAvailable()
      val got = spark.table("st_curate").select($"doc_id", $"q")
        .as[(Long, Double)].collect().toMap
      assert(got.keySet === Set(1L, 5L))
      assert(got(1L) === 3.0 && got(5L) === 2.5)
    } finally q.stop()
  }
}
