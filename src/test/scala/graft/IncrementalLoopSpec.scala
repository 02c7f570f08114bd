package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}
import graft.streaming.StreamClusters

/** The incremental corpus loop, end-to-end over persisted parquet
  * indexes (SCALE.md "The incremental corpus loop"): batches arrive one
  * at a time; each batch
  *
  *   1. exact-dedups against the growing content-hash index (x48
  *      probe), then APPENDS its new hashes;
  *   2. generates near-dup pairs against the growing fingerprint
  *      relation (x86 probe), then APPENDS its fingerprints;
  *   3. folds those pairs into the cluster-labels store (x103 /
  *      StreamClusters generations).
  *
  * After EVERY prefix of batches, each maintained artifact must equal
  * its batch recompute over the closed corpus — the loop never re-reads
  * historic text, yet stays exactly lossless. This is the
  * integration-level proof that the per-operator delta contracts
  * compose.
  */
class IncrementalLoopSpec extends SparkTestBase {
  import spark.implicits._

  test("three batches through hash-index append + simhash-delta pairs " +
    "+ cluster folds equal the batch pipeline after every prefix") {
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // id-RANGE batches: arrival order coincides with id order, so the
    // incremental first-arrival keep equals batch Dedup.exact's min-id
    // keep (the x48 replay contract — batches are ingestion slices, not
    // arbitrary shuffles)
    val maxId = all.agg(max(col("doc_id"))).as[Long].collect().head
    val cut1 = maxId / 3
    val cut2 = 2 * maxId / 3
    val batches = Seq(
      all.filter(col("doc_id") <= cut1),
      all.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
      all.filter(col("doc_id") > cut2))

    val base = Files.createTempDirectory("inc-loop-")
    val hashDir = s"$base/hash_index"
    val fpDir = s"$base/fps"
    val lblDir = s"$base/labels"

    var closed: Option[DataFrame] = None
    var acceptedIds = Set.empty[Long]
    var pairsSeen = Set.empty[(Long, Long, Int)]

    for ((batch, b) <- batches.zipWithIndex) {
      // --- 1. exact dedup against the growing index, then append
      val haveIndex = b > 0
      val index =
        if (haveIndex) spark.read.parquet(hashDir)
        else Dedup.hashIndex(all.limit(0))
      val fresh = Dedup.exactDelta(batch, index)
        .as[Long].collect().toSet
      acceptedIds ++= fresh
      val newHashes = Dedup.hashIndex(batch)
        .join(index, Seq("h"), "left_anti")
      if (haveIndex)
        newHashes.write.mode("append").parquet(hashDir)
      else Dedup.hashIndex(batch).write.parquet(hashDir)

      // --- 2. near-dup pairs vs the growing fingerprint relation
      val corpusFps =
        if (b > 0) spark.read.parquet(fpDir)
        else Dedup.simhash(all.limit(0), poly = true)
      val deltaPairs = Dedup.simhashPairsDelta(batch, corpusFps,
        maxHamming = 3, poly = true)
      pairsSeen ++= deltaPairs.as[(Long, Long, Int)].collect().toSet
      Dedup.simhash(batch, poly = true).write
        .mode(if (b > 0) "append" else "overwrite").parquet(fpDir)

      // --- 3. fold the batch's pairs into the labels store
      StreamClusters.foldBatch(lblDir,
        deltaPairs.select(col("doc_a"), col("doc_b")), batchId = b.toLong)

      // --- assertions against the batch pipeline on the closed corpus
      closed = Some(closed.map(_.unionByName(batch)).getOrElse(batch))
      val c = closed.get.persist()

      val batchExactSurvivors = Dedup.exact(c)
        .select(col("keep_id")).as[Long].collect().toSet
      assert(acceptedIds === batchExactSurvivors, s"prefix ${b + 1}: exact")

      val batchPairs = Dedup.simhashPairs(c, maxHamming = 3, poly = true)
        .as[(Long, Long, Int)].collect().toSet
      assert(pairsSeen === batchPairs, s"prefix ${b + 1}: pairs")

      val liveLabels = StreamClusters.labels(spark, lblDir)
        .as[(Long, Long)].collect().toSet
      val batchLabels = Graph.connectedComponents(
        Dedup.simhashPairs(c, maxHamming = 3, poly = true))
        .as[(Long, Long)].collect().toSet
      assert(liveLabels === batchLabels, s"prefix ${b + 1}: labels")
      c.unpersist()
    }
    assert(acceptedIds.nonEmpty && pairsSeen.nonEmpty,
      "fixture must exercise dedup and near-dup paths")
  }
}
