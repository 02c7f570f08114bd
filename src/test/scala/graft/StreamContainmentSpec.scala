package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamContainment

/** Streaming containment: micro-batches through the delta-store sink
  * accumulate EXACTLY the batch containment join's pairs — each pair
  * surfaces once, in the batch of its later-arriving endpoint — and
  * the protocol inherits replay/compaction safety from the corpus
  * loop. */
class StreamContainmentSpec extends SparkTestBase {
  import spark.implicits._

  private val threshold = 0.9
  private val n = 12

  private def batchWant(docs: DataFrame): Set[(Long, Long, Double)] =
    Dedup.containmentPairs(docs, threshold = threshold, n = n)
      .as[(Long, Long, Double)].collect().toSet

  test("N micro-batches equal batch containmentPairs after every " +
    "prefix; replay and compaction are no-ops; loop continues after") {
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("stream-containment-").toString

    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val maxId = all.agg(max($"doc_id")).as[Long].head()
    val cut1 = maxId / 3
    val cut2 = 2 * maxId / 3
    def rows(d: DataFrame): Seq[(Long, String)] =
      d.as[(Long, String)].collect().toSeq
    val batches = Seq(
      rows(all.filter($"doc_id" <= cut1)),
      rows(all.filter($"doc_id" > cut1 && $"doc_id" <= cut2)),
      rows(all.filter($"doc_id" > cut2)))

    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamContainment.sink(dir, threshold, n))
      .option("checkpointLocation",
        Files.createTempDirectory("stream-containment-ckpt-").toString)
      .start()
    try {
      var closed: Option[DataFrame] = None
      for (batch <- batches) {
        in.addData(batch); q.processAllAvailable()
        closed = Some(closed
          .map(_.unionByName(batch.toDF("doc_id", "text")))
          .getOrElse(batch.toDF("doc_id", "text")))
        val got = StreamContainment.pairs(spark, dir)
          .as[(Long, Long, Double)].collect()
        // exactly-once: the union carries no duplicate pair rows
        assert(got.length === got.distinct.length, "duplicate pairs")
        assert(got.toSet === batchWant(closed.get),
          "pairs after prefix")
      }

      def snapshot(): Set[(Long, Long, Double)] =
        StreamContainment.pairs(spark, dir)
          .as[(Long, Long, Double)].collect().toSet
      val before = snapshot()
      assert(before.nonEmpty, "fixture must produce containment pairs")

      // restart safety: replay the last batch (reversed row order)
      StreamContainment.foldBatch(dir,
        batches.last.reverse.toDF("doc_id", "text"), batchId = 2L,
        threshold = threshold, n = n)
      assert(snapshot() === before, "replay must be a no-op")

      // a foreign directory in a store is skipped, not fatal — even a
      // _SUCCESS-marked one with a non-numeric suffix (delta=3.bak)
      new java.io.File(s"$dir/cindex/delta=tmp").mkdirs()
      new java.io.File(s"$dir/pairs/delta=3.bak").mkdirs()
      assert(new java.io.File(s"$dir/pairs/delta=3.bak/_SUCCESS")
        .createNewFile())
      assert(snapshot() === before, "foreign dirs must be ignored")

      // compaction behind the committed watermark
      StreamContainment.compact(spark, dir, below = 2L)
      assert(snapshot() === before, "compaction must not change reads")
      // the aggregated df store survives compaction exactly
      val dfAfter = StreamContainment.gramDf(spark, dir)
        .as[(Long, Long)].collect().toSet
      StreamContainment.compact(spark, dir, below = 2L) // idempotent
      assert(StreamContainment.gramDf(spark, dir)
        .as[(Long, Long)].collect().toSet === dfAfter)

      // post-compaction replay of the frontier batch is still a no-op
      StreamContainment.foldBatch(dir,
        batches.last.reverse.toDF("doc_id", "text"), batchId = 2L,
        threshold = threshold, n = n)
      assert(snapshot() === before, "post-compaction replay is a no-op")

      // the loop continues on the compacted store: one more batch of
      // re-keyed docs (guaranteed containment hits vs their originals)
      val extra = all.filter($"doc_id" <= cut1 / 2)
        .withColumn("doc_id", $"doc_id" + 1000000L)
        .as[(Long, String)].collect().toSeq
      StreamContainment.foldBatch(dir, extra.toDF("doc_id", "text"),
        batchId = 3L, threshold = threshold, n = n)
      val closedAll = closed.get
        .unionByName(extra.toDF("doc_id", "text"))
      assert(snapshot() === batchWant(closedAll),
        "post-compaction fold equals the closed-corpus batch join")
    } finally q.stop()
  }
}
