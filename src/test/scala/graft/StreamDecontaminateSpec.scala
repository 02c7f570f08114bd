package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamDecontaminate

/** Streaming decontamination mirrors the batch operator: per-document
  * results are independent of micro-batching (the benchmark is static),
  * so after any prefix of batches the emitted rows equal
  * [[Dedup.decontaminate]] over the same closed input. */
class StreamDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // 16-letter alphabet: 4-gram universe of 65536, so chance overlap
  // between random strings is negligible — contamination in this spec
  // comes only from the embedded benchmark substrings
  private val rnd = new scala.util.Random(53)
  private val alphabet = "abcdefghijklmnop"
  private def randText(n: Int) =
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("stream flag ≡ batch decontaminate after every batch prefix; " +
    "clean drops exactly the contaminated ids") {
    implicit val sql = spark.sqlContext
    val benchTexts = (0 until 5).map(_ => randText(30))
    val bench = benchTexts.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    // half the docs carry a verbatim benchmark substring → contaminated
    val docs = (0 until 40).map { i =>
      val t =
        if (i % 2 == 0) randText(10 + rnd.nextInt(20))
        else randText(5) + benchTexts(rnd.nextInt(5)) + randText(5)
      (i.toLong, t)
    }
    val (batch1, batch2) = docs.splitAt(23)

    val in = MemoryStream[(Long, String)]
    val out = StreamDecontaminate.flag(
      in.toDF().toDF("doc_id", "text"), bench,
      minSharedGrams = 5, n = 4)
    val q = out.writeStream.format("memory").queryName("st_decon")
      .outputMode("append").start()
    try {
      def check(closed: Seq[(Long, String)]): Unit = {
        val got = spark.table("st_decon")
          .select($"doc_id", $"n_shared", $"contaminated")
          .as[(Long, Long, Boolean)].collect().toSet
        val want = Dedup.decontaminate(closed.toDF("doc_id", "text"),
          bench, minSharedGrams = 5, n = 4)
          .as[(Long, Long, Boolean)].collect().toSet
        assert(got === want)
        assert(got.exists(_._3) && got.exists(!_._3)) // both classes live
      }
      in.addData(batch1); q.processAllAvailable(); check(batch1)
      in.addData(batch2); q.processAllAvailable(); check(docs)
    } finally q.stop()

    // clean mode: the surviving id set is exactly the uncontaminated one
    val in2 = MemoryStream[(Long, String)]
    val cleaned = StreamDecontaminate.clean(
      in2.toDF().toDF("doc_id", "text"), bench,
      minSharedGrams = 5, n = 4)
    assert(cleaned.columns.toSeq === Seq("doc_id", "text"))
    val q2 = cleaned.writeStream.format("memory").queryName("st_decon_cl")
      .outputMode("append").start()
    try {
      in2.addData(docs); q2.processAllAvailable()
      val kept = spark.table("st_decon_cl").select($"doc_id")
        .as[Long].collect().toSet
      val want = Dedup.decontaminate(docs.toDF("doc_id", "text"), bench,
        minSharedGrams = 5, n = 4)
        .filter(!$"contaminated").select($"doc_id")
        .as[Long].collect().toSet
      assert(kept === want)
    } finally q2.stop()
  }

  test("guards: oversized benchmark points at the foreachBatch route; " +
    "output-name collisions and bad params rejected") {
    implicit val sql = spark.sqlContext
    val bench = Seq((1L, randText(40))).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val e1 = intercept[IllegalArgumentException] {
      StreamDecontaminate.flag(in.toDF().toDF("doc_id", "text"), bench,
        n = 4, maxBroadcastGrams = 2L)
    }
    assert(e1.getMessage.contains("decontaminateBloom"))
    val e2 = intercept[IllegalArgumentException] {
      StreamDecontaminate.flag(
        in.toDF().toDF("doc_id", "contaminated"), bench, n = 4)
    }
    assert(e2.getMessage.contains("contaminated"))
    val e3 = intercept[IllegalArgumentException] {
      StreamDecontaminate.flag(in.toDF().toDF("doc_id", "text"), bench,
        minSharedGrams = 0)
    }
    assert(e3.getMessage.contains("minSharedGrams"))
  }
}
