package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** The incremental corpus loop, ONLINE: one `foreachBatch` sink that
  * maintains all three dedup artifacts per micro-batch — the streaming
  * composition of the per-operator delta contracts that
  * `IncrementalLoopSpec` proves batch-by-batch (SCALE.md "The
  * incremental corpus loop"):
  *
  *   1. content-hash index (x48 probe → append): each batch exact-dedups
  *      against the growing index and contributes its NEW hashes;
  *   2. fingerprint relation (x86 probe → append): each batch's simhash
  *      pairs form against corpus + batch fingerprints — corpus×corpus
  *      pairs structurally cannot re-form;
  *   3. cluster labels ([[StreamClusters]] generations): the batch's
  *      pairs fold into the persisted (node, component) labeling.
  *
  * Storage protocol: stores 1, 2 and the accepted-ids output are
  * APPEND-ONLY as per-batch `delta=<batchId>` parquet directories —
  * delta-sized writes (never an O(corpus) snapshot), each committed
  * atomically by the parquet job (`_SUCCESS`); store 3 reuses
  * [[StreamClusters]]' full-snapshot generations (O(labeled nodes) ∝
  * duplicates). Restart safety: every read for batch N unions only
  * COMPLETE deltas / generations STRICTLY BELOW N, and every write
  * overwrites batch N's own directory — a replayed batch rebuilds from
  * exactly the base its first attempt saw, so the sink is
  * replay-idempotent store-by-store and a crash between stores heals on
  * replay. Arrival-order contract: batches are ingestion slices (the
  * x48 replay contract), so the first-arrival keep equals batch
  * [[Dedup.exact]]'s min-id keep when ids are arrival-ordered.
  */
object StreamCorpusLoop {

  private val hashSchema = StructType(Seq(StructField("h", BinaryType)))
  private val fpSchema = StructType(Seq(
    StructField("id", LongType), StructField("simhash", LongType)))

  private def hashDir(dir: String) = s"$dir/hash"
  private def fpDir(dir: String) = s"$dir/fps"
  private def labelsDir(dir: String) = s"$dir/labels"
  private def acceptedDir(dir: String) = s"$dir/accepted"

  /** Complete (`_SUCCESS`-marked) `delta=` directories under `dir`,
    * optionally restricted to batch ids strictly below `below`. */
  private def completeDeltas(spark: SparkSession, dir: String,
      below: Option[Long]): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("delta="))
      .filter(gp => fs.exists(new Path(gp, "_SUCCESS")))
      .filter(gp => below.forall(
        gp.getName.stripPrefix("delta=").toLong < _))
      .map(_.toString)
  }

  private def readDeltas(spark: SparkSession, dir: String,
      schema: StructType, below: Option[Long]): DataFrame =
    completeDeltas(spark, dir, below) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case paths => spark.read.schema(schema).parquet(paths: _*)
    }

  /** Fold one micro-batch of documents through all three artifacts
    * (the testable core; [[sink]] adapts it to `foreachBatch`). */
  def foldBatch(dir: String, batch: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col(idCol), col(textCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 1. exact dedup against the growing hash index, then append the
    // batch's NEW hashes (left_anti keeps the index a set across deltas)
    val idx = readDeltas(spark, hashDir(dir), hashSchema, Some(batchId))
    Dedup.exactDelta(b, idx, idCol, textCol)
      .write.mode("overwrite")
      .parquet(s"${acceptedDir(dir)}/delta=$batchId")
    Dedup.hashIndex(b, textCol).join(idx, Seq("h"), "left_anti")
      .write.mode("overwrite")
      .parquet(s"${hashDir(dir)}/delta=$batchId")

    // 2. near-dup pairs against corpus + batch fingerprints (delta
    // probes; corpus×corpus pairs structurally cannot form), then
    // append the batch's fingerprints
    val corpusFps = readDeltas(spark, fpDir(dir), fpSchema, Some(batchId))
    val dFps = Dedup.simhash(b, idCol, textCol, poly = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup
      .simhashPairsDeltaFps(dFps, corpusFps, maxHamming)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 3. fold the batch's pairs into the labels store (StreamClusters'
    // generation protocol is itself replay-idempotent)
    StreamClusters.foldBatch(labelsDir(dir),
      pairs.select(col("doc_a"), col("doc_b")), batchId)
    dFps.write.mode("overwrite").parquet(s"${fpDir(dir)}/delta=$batchId")

    pairs.unpersist(false)
    dFps.unpersist(false)
    b.unpersist(false)
  }

  /** `foreachBatch` adapter: `docsStream.writeStream.foreachBatch(
    * StreamCorpusLoop.sink(dir)).start()`. */
  def sink(dir: String, idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      foldBatch(dir, batch, batchId, idCol, textCol, maxHamming)

  /** Accepted (first-arrival unique-content) doc ids across every
    * complete batch. */
  def acceptedIds(spark: SparkSession, dir: String,
      idCol: String = "doc_id"): DataFrame =
    readDeltas(spark, acceptedDir(dir),
      StructType(Seq(StructField(idCol, LongType))), None)

  /** The growing content-hash index (one 16-byte row per distinct
    * accepted content). */
  def hashIndex(spark: SparkSession, dir: String): DataFrame =
    readDeltas(spark, hashDir(dir), hashSchema, None)

  /** The growing fingerprint relation (id, simhash). */
  def fps(spark: SparkSession, dir: String): DataFrame =
    readDeltas(spark, fpDir(dir), fpSchema, None)

  /** Current cluster labels (delegates to [[StreamClusters]]). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    StreamClusters.labels(spark, labelsDir(dir))
}
