package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{KeywordExprs, TextAnalysis}
import graft.streaming.StreamScreen

/** The ingestion screen (PII scrub + keyword tagging) is a pure
  * projection: streaming it over a closed corpus equals the batch
  * projection row for row, at any batch split. */
class StreamScreenSpec extends SparkTestBase {
  import spark.implicits._

  private val kws = Seq("spark", "scan", "a a")

  private def batchReference(docs: Seq[(Long, String)]) = {
    val df = docs.toDF("doc_id", "text")
    val red = TextAnalysis.scrubPii($"text")
    df.select($"doc_id", red.as("text"),
        KeywordExprs.keywordCounts(red, kws).as("_kc"))
      .select($"doc_id", $"text",
        coalesce(aggregate($"_kc", lit(0L), (a, c) => a + c), lit(0L))
          .as("kw_hits"),
        coalesce(size(filter($"_kc", c => c > lit(0L))), lit(0))
          .as("kw_kinds"))
      .as[(Long, Option[String], Long, Int)].collect().toSeq.sortBy(_._1)
  }

  test("stream ≡ batch over a closed corpus at any split; PII masks " +
    "before counting; null text screens to (null, 0, 0)") {
    implicit val sql = spark.sqlContext
    val docs: Seq[(Long, String)] = Seq(
      1L -> "a fast scan beats a a slow spark scan",
      2L -> "mail me at spark@scan.io or 10.0.0.1", // PII inside keywords
      3L -> null.asInstanceOf[String],
      4L -> "ssn 123-45-6789 then scan scan scan",
      5L -> "plain text with nothing of note")
    val want = batchReference(docs)
    assert(want.map(_._3).sum > 0) // the fixture actually hits

    // keyword counting runs on the REDACTED text: doc 2's
    // "spark@scan.io" collapses to <EMAIL>, so neither 'spark' nor
    // 'scan' may be counted from inside the masked span
    val d2 = want.find(_._1 == 2L).get
    assert(d2._2.get.contains("<EMAIL>") && d2._2.get.contains("<IP>"))
    assert(d2._3 === 0L && d2._4 === 0)
    val d3 = want.find(_._1 == 3L).get
    assert(d3._2.isEmpty && d3._3 === 0L && d3._4 === 0)

    for (splitAt <- Seq(1, 3)) {
      val in = MemoryStream[(Long, String)]
      val q = StreamScreen.annotate(in.toDF().toDF("doc_id", "text"), kws)
        .writeStream.format("memory").queryName(s"st_screen_$splitAt")
        .outputMode("append").start()
      try {
        val (b1, b2) = docs.splitAt(splitAt)
        in.addData(b1); q.processAllAvailable()
        in.addData(b2); q.processAllAvailable()
        val got = spark.table(s"st_screen_$splitAt")
          .select($"doc_id", $"text", $"kw_hits", $"kw_kinds")
          .as[(Long, Option[String], Long, Int)].collect().toSeq
          .sortBy(_._1)
        assert(got === want, s"split at $splitAt")
      } finally q.stop()
    }
  }

  test("column-collision and missing-text guards fail loudly") {
    val df = Seq((1L, "t", 0L)).toDF("doc_id", "text", "kw_hits")
    intercept[IllegalArgumentException] {
      StreamScreen.annotate(df, kws)
    }
    intercept[IllegalArgumentException] {
      StreamScreen.annotate(Seq(1L).toDF("doc_id"), kws)
    }
  }
}
