package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Vocab
import graft.streaming.StreamOovMonitor

/** Streaming OOV monitoring: annotate is a pure projection whose
  * per-batch rollup equals the batch oovRate operator. */
class StreamOovMonitorSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed annotate + rates over all micro-batches equals batch " +
    "Vocab.oovRate on the same closed corpus") {
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = Vocab.topTokens(docs, col("text"), k = 200)
      .select(col("token"))
    val rows = docs.select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq

    val in = MemoryStream[(Long, String, String)]
    val annotated = StreamOovMonitor.annotate(
      in.toDF().toDF("doc_id", "source", "text"), vocab)
    val q = annotated.writeStream.format("memory")
      .queryName("oov_annotated").outputMode("append").start()
    try {
      in.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      in.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
      val got = StreamOovMonitor.rates(spark.table("oov_annotated"))
        .as[(String, Long, Long, Double)].collect().toSet
      val want = Vocab.oovRate(docs, vocab)
        .as[(String, Long, Long, Double)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("null text annotates (0, 0); name collisions rejected") {
    val vocab = Seq("a").toDF("token")
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b a"))
      .toDF("doc_id", "text")
    val got = StreamOovMonitor.annotate(df, vocab)
      .select($"doc_id", $"n_tokens", $"n_oov")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((3L, 1L)))
    intercept[IllegalArgumentException] {
      StreamOovMonitor.annotate(
        StreamOovMonitor.annotate(df, vocab), vocab)
    }
  }

  test("over-cap vocabulary fails fast via the bounded cardinality " +
    "probe, never materializing the relation on the driver") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    // 50M distinct tokens: collecting this first (the old guard order)
    // would OOM/stall the driver; the limit(cap+1) probe must reject it
    // in bounded time
    val huge = spark.range(0, 50000000L)
      .select(concat(lit("tok"), col("id")).as("token"))
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException] {
      StreamOovMonitor.annotate(df, huge, maxVocab = 1000)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("cardinality probe"))
    // generous wall bound: the limit-pruned probe reads ~1k rows
    // (sub-second unloaded; observed 70 s under a fully contended box
    // running the bench suite concurrently), while the failure mode it
    // guards — collecting the 50M-row relation on the driver — stalls
    // for many minutes or OOMs outright. 300 s separates the two
    // regimes under any realistic contention without flaking.
    assert(secs < 300.0, s"probe took ${secs}s — not bounded")
    // an in-cap vocab on the same relation shape still annotates
    val ok = StreamOovMonitor.annotate(df,
      spark.range(0, 10L).select(concat(lit("x"), col("id")).as("token")))
      .select($"n_tokens", $"n_oov").as[(Long, Long)].head()
    assert(ok === ((2L, 2L)))
    // the plan-literal default cap itself is bounded at 1e6
    intercept[IllegalArgumentException] {
      StreamOovMonitor.annotate(df, vocab = Seq("a").toDF("token"),
        maxVocab = 2000000)
    }
  }
}
