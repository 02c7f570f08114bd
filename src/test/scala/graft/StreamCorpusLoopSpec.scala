package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}
import graft.streaming.StreamCorpusLoop

/** The incremental corpus loop as ONE foreachBatch stream: micro-batches
  * maintain the content-hash index, the fingerprint relation, and the
  * cluster labels; after every prefix each artifact equals its batch
  * recompute over the closed corpus (the streaming composition of
  * IncrementalLoopSpec), and replaying a batch changes nothing.
  */
class StreamCorpusLoopSpec extends SparkTestBase {
  import spark.implicits._

  test("N micro-batches through the loop equal the batch recompute " +
    "after every prefix; replayed batches are idempotent") {
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("stream-corpus-loop-").toString

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
      .writeStream.foreachBatch(StreamCorpusLoop.sink(dir))
      .option("checkpointLocation",
        Files.createTempDirectory("stream-corpus-loop-ckpt-").toString)
      .start()
    try {
      var closed: Option[DataFrame] = None
      for (batch <- batches) {
        in.addData(batch); q.processAllAvailable()
        closed = Some(closed
          .map(_.unionByName(batch.toDF("doc_id", "text")))
          .getOrElse(batch.toDF("doc_id", "text")))
        val c = closed.get.persist()

        // 1. accepted ids ≡ batch exact-dedup survivors
        val got = StreamCorpusLoop.acceptedIds(spark, dir)
          .as[Long].collect().toSet
        val want = Dedup.exact(c).select($"keep_id")
          .as[Long].collect().toSet
        assert(got === want, "accepted ids")

        // hash index ≡ distinct content hashes of the closed corpus
        assert(StreamCorpusLoop.hashIndex(spark, dir).count() ===
          Dedup.hashIndex(c).count(), "hash index")

        // 2. fingerprint relation ≡ batch simhash over the closed corpus
        val gotFps = StreamCorpusLoop.fps(spark, dir)
          .as[(Long, Long)].collect().toSet
        val wantFps = Dedup.simhash(c, poly = true)
          .as[(Long, Long)].collect().toSet
        assert(gotFps === wantFps, "fingerprints")

        // 3. labels ≡ batch CC over the closed pair set
        val gotLbl = StreamCorpusLoop.labels(spark, dir)
          .as[(Long, Long)].collect().toSet
        val wantLbl = Graph.connectedComponents(
          Dedup.simhashPairs(c, maxHamming = 3, poly = true))
          .as[(Long, Long)].collect().toSet
        assert(gotLbl === wantLbl, "labels")
        c.unpersist()
      }

      // restart safety: replay the LAST batch (reversed row order) —
      // every store rebuilds from bases strictly below the batch id and
      // overwrites its own delta, so nothing changes
      def snapshot(): (Set[Long], Set[(Long, Long)], Set[(Long, Long)]) = (
        StreamCorpusLoop.acceptedIds(spark, dir).as[Long].collect().toSet,
        StreamCorpusLoop.fps(spark, dir)
          .as[(Long, Long)].collect().toSet,
        StreamCorpusLoop.labels(spark, dir)
          .as[(Long, Long)].collect().toSet)
      val before = snapshot()
      StreamCorpusLoop.foldBatch(dir,
        batches.last.reverse.toDF("doc_id", "text"), batchId = 2L)
      assert(snapshot() === before, "replay must be a no-op")

      // a half-written delta (no _SUCCESS) is invisible to readers
      new java.io.File(s"$dir/hash/delta=99").mkdirs()
      new java.io.File(s"$dir/accepted/delta=99").mkdirs()
      assert(snapshot() === before, "incomplete deltas must be invisible")

      // compaction behind the committed watermark (last committed = 2):
      // readers see byte-identical content, subsumed deltas are gone
      StreamCorpusLoop.compact(spark, dir, below = 2L)
      assert(snapshot() === before, "compaction must not change reads")
      def deltaIds(sub: String): Set[Long] = {
        val d = new java.io.File(s"$dir/$sub")
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("delta="))
          .map(_.getName.stripPrefix("delta=").toLong).toSet
      }
      assert(deltaIds("hash").filter(_ < 2L).isEmpty, "deltas pruned")
      assert(deltaIds("fps").filter(_ < 2L).isEmpty)
      // a replay of the frontier batch reads base=2 + nothing and
      // rebuilds identically
      StreamCorpusLoop.foldBatch(dir,
        batches.last.reverse.toDF("doc_id", "text"), batchId = 2L)
      assert(snapshot() === before, "post-compaction replay is a no-op")
      // compaction is idempotent
      StreamCorpusLoop.compact(spark, dir, below = 2L)
      assert(snapshot() === before)

      // the loop continues on the compacted store: one more batch,
      // still ≡ the closed-corpus batch recompute
      val extra = all.filter($"doc_id" <= cut1 / 2)
        .withColumn("doc_id", $"doc_id" + 1000000L)
        .as[(Long, String)].collect().toSeq
      StreamCorpusLoop.foldBatch(dir, extra.toDF("doc_id", "text"),
        batchId = 3L)
      val closedAll = closed.get.unionByName(extra.toDF("doc_id", "text"))
        .persist()
      assert(StreamCorpusLoop.acceptedIds(spark, dir)
        .as[Long].collect().toSet ===
        Dedup.exact(closedAll).select($"keep_id").as[Long].collect().toSet,
        "post-compaction fold: accepted")
      assert(StreamCorpusLoop.labels(spark, dir)
        .as[(Long, Long)].collect().toSet ===
        Graph.connectedComponents(
          Dedup.simhashPairs(closedAll, maxHamming = 3, poly = true))
          .as[(Long, Long)].collect().toSet,
        "post-compaction fold: labels")
      closedAll.unpersist()

      assert(before._1.nonEmpty && before._3.nonEmpty,
        "fixture must exercise dedup and clustering paths")
    } finally q.stop()
  }

  test("automatic compaction cadence: ~30 micro-batches with " +
    "compactEvery=5 keep the store's directory count bounded and the " +
    "artifacts equal to the batch recompute") {
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("stream-corpus-auto-").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val nBatches = 30
    val slices = all.grouped(
      math.max(1, (all.size + nBatches - 1) / nBatches)).toSeq

    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamCorpusLoop.sink(dir, compactEvery = 5))
      .option("checkpointLocation",
        Files.createTempDirectory("stream-corpus-auto-ckpt-").toString)
      .start()
    try {
      for (s <- slices) { in.addData(s); q.processAllAvailable() }
      def dirCount(sub: String): Int = {
        val d = new java.io.File(s"$dir/$sub")
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(f => f.isDirectory &&
            (f.getName.startsWith("delta=") || f.getName.startsWith("base=")))
      }
      // compaction fired mid-stream: per-store directory count stays
      // bounded by one base + the deltas since the last watermark,
      // never ~30 (one per batch)
      for (sub <- Seq("hash", "fps", "accepted")) {
        assert(dirCount(sub) <= 7,
          s"$sub: ${dirCount(sub)} dirs — compaction cadence not firing")
      }
      // and the compacted loop is still CORRECT: artifacts equal the
      // closed-corpus batch recompute
      val closed = all.toDF("doc_id", "text").persist()
      assert(StreamCorpusLoop.acceptedIds(spark, dir)
        .as[Long].collect().toSet ===
        Dedup.exact(closed).select($"keep_id").as[Long].collect().toSet)
      assert(StreamCorpusLoop.fps(spark, dir)
        .as[(Long, Long)].collect().toSet ===
        Dedup.simhash(closed, poly = true)
          .as[(Long, Long)].collect().toSet)
      assert(StreamCorpusLoop.labels(spark, dir)
        .as[(Long, Long)].collect().toSet ===
        Graph.connectedComponents(
          Dedup.simhashPairs(closed, maxHamming = 3, poly = true))
          .as[(Long, Long)].collect().toSet)
      closed.unpersist()
    } finally q.stop()
  }

  test("compact vs a concurrent reader: a pre-compaction file listing " +
    "fails with a missing-file error, withStoreRetry heals it exactly, " +
    "and an EXTERNAL compact racing an in-flight foldBatch never fails " +
    "the batch or corrupts the artifacts") {
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val dir = Files.createTempDirectory("stream-corpus-race-").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val slices = all.grouped(math.max(1, all.size / 7 + 1)).toSeq
    require(slices.size >= 7, s"fixture too small: ${slices.size} slices")

    // seed batches 0..3
    for (i <- 0 to 3)
      StreamCorpusLoop.foldBatch(dir, slices(i).toDF("doc_id", "text"),
        batchId = i.toLong)

    // 1. the hazard is REAL: a df whose file listing predates the
    // compaction fails once its tasks read the pruned delta files
    val hashSchema = StructType(Seq(StructField("h", BinaryType)))
    val staleDeltas = (0 to 3).map(i => s"$dir/hash/delta=$i")
    val stale = spark.read.schema(hashSchema).parquet(staleDeltas: _*)
    val expectedHashes = stale.count() // listing + a successful read
    StreamCorpusLoop.compact(spark, dir, below = 4L)
    val e = intercept[Throwable] { stale.count() }
    assert(StreamCorpusLoop.isMissingFileFailure(e),
      s"expected a missing-file failure, got: $e")

    // 2. withStoreRetry heals it EXACTLY: first attempt reads the stale
    // plan and fails, the retry rebuilds from a fresh listing and
    // returns the content the first attempt would have
    var attempts = 0
    val healed = StreamCorpusLoop.withStoreRetry("spec") {
      attempts += 1
      if (attempts == 1) stale.count()
      else StreamCorpusLoop.hashIndex(spark, dir).count()
    }
    assert(attempts === 2, "retry must fire exactly once")
    assert(healed === expectedHashes,
      "post-compaction content must equal the pre-compaction union")
    // a non-missing-file failure propagates without a retry
    var attempts2 = 0
    val e2 = intercept[IllegalStateException] {
      StreamCorpusLoop.withStoreRetry("spec2") {
        attempts2 += 1
        throw new IllegalStateException("real fault")
      }
    }
    assert(attempts2 === 1 && e2.getMessage === "real fault")

    // 3. end-to-end: an external compact racing an in-flight foldBatch,
    // at several interleavings — the batch must never fail, and the
    // final artifacts must equal the closed-corpus batch recompute
    for ((delayMs, i) <- Seq(0L, 15L, 40L).zipWithIndex) {
      val batchId = 4L + i
      val compactor = new Thread(() => {
        if (delayMs > 0) Thread.sleep(delayMs)
        StreamCorpusLoop.compact(spark, dir, below = batchId)
      })
      compactor.start()
      StreamCorpusLoop.foldBatch(dir,
        slices(4 + i).toDF("doc_id", "text"), batchId = batchId)
      compactor.join()
    }
    val closed = slices.take(7).flatten.toDF("doc_id", "text").persist()
    assert(StreamCorpusLoop.acceptedIds(spark, dir)
      .as[Long].collect().toSet ===
      Dedup.exact(closed).select($"keep_id").as[Long].collect().toSet,
      "accepted after race")
    assert(StreamCorpusLoop.fps(spark, dir)
      .as[(Long, Long)].collect().toSet ===
      Dedup.simhash(closed, poly = true).as[(Long, Long)].collect().toSet,
      "fps after race")
    assert(StreamCorpusLoop.labels(spark, dir)
      .as[(Long, Long)].collect().toSet ===
      Graph.connectedComponents(
        Dedup.simhashPairs(closed, maxHamming = 3, poly = true))
        .as[(Long, Long)].collect().toSet,
      "labels after race")
    closed.unpersist()
  }
}
