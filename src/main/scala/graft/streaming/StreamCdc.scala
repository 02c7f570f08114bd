package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Streaming CDC sub-document deduplication — the ingestion-time
  * mirror of [[graft.operators.Dedup.cdcOverlapPairs]], built as the
  * incremental delta pass ([[graft.operators.Dedup.cdcOverlapDelta]]'s
  * shape) applied per micro-batch against a persisted chunk index
  * (the [[StreamNearDedup]] pattern applied to CDC):
  *
  *  1. one doc-local codegen byte-pass chunks the batch and reduces it
  *     to DISTINCT `(fp, len, doc_id)` chunk keys ≥ `minLen` bytes
  *     (the [[graft.operators.Dedup.cdcChunkIndex]] relation, computed
  *     on the batch);
  *  2. the batch probes the accumulated index UNION its own keys —
  *     key-equality join on `(fp, len)`, candidates ∝ batch duplicate
  *     mass, never index×index; batch-internal pairs canonicalize via
  *     least/greatest, corpus-internal pairs cannot form
  *     ([[graft.operators.Dedup.cdcOverlapIncrement]]);
  *  3. emitted pairs append to `outDir/pairs`, the batch's chunk keys
  *     append to `outDir/chunks`, both batch_id-partitioned with
  *     dynamic partition overwrite so a replayed batch overwrites
  *     exactly its own contribution (the [[RegisterStream.dualSink]]
  *     idempotence discipline).
  *
  * After any prefix of batches, [[pairsView]] equals batch
  * [[graft.operators.Dedup.cdcOverlapPairs]] on the union of those
  * batches — a pair is emitted exactly once, when its later member
  * arrives — PROVIDED no chunk key's document frequency crosses
  * `maxDocsPerChunk` between a pair's emission and the end of the
  * prefix; the deviation is one-sided (the stream never misses a pair
  * the batch run keeps — see [[Dedup.cdcOverlapIncrement]]). Doc ids
  * must be globally unique across batches, the same precondition as
  * every delta route.
  *
  * Why a parquet chunk index and not state-store state: candidate
  * generation is a cross-batch JOIN on `(fp, len)` — not a point
  * lookup — and the probe relation IS what the batch delta operator
  * consumes, so batch and stream share one code path (the
  * [[StreamNearDedup]] argument, with a lighter per-row payload: chunk
  * keys are fixed-width, so the index costs O(chunks), not
  * O(shingle sets)). */
object StreamCdc {

  private val chunkSchema =
    "fp bigint, len int, doc_id bigint, batch_id bigint"
  private val pairSchema =
    "doc_a bigint, doc_b bigint, shared_chunks bigint, " +
      "shared_bytes bigint, batch_id bigint"

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Start the sink: for each micro-batch of documents, emit overlap
    * pairs touching the batch and grow the chunk index. `docs` must
    * carry a long id column and a text column. */
  def sink(docs: DataFrame, outDir: String, checkpoint: String,
      w: Int = 16, maskBits: Int = 6, minLen: Int = 24,
      minSharedBytes: Int = 48, maxDocsPerChunk: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      minChunk: Int = 1, maxChunk: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val keys = Dedup.cdcChunkIndex(batch, idCol, textCol, w,
            maskBits, minLen, minChunk, maxChunk)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // strictly-older batches only: a replayed batch must not see
          // its own crashed partial write as "corpus"
          val corpus = readOrEmpty(spark, s"$outDir/chunks", chunkSchema)
            .filter(col("batch_id") < batchId)
            .select(col("fp"), col("len"), col("doc_id").as(idCol))
          Dedup.cdcOverlapIncrement(keys, corpus, idCol,
              minSharedBytes, maxDocsPerChunk)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/pairs")
          keys.select(col("fp"), col("len"),
              col(idCol).as("doc_id"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/chunks")
        } finally { keys.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** All overlap pairs seen so far — equal to batch
    * [[Dedup.cdcOverlapPairs]] over the union of committed batches
    * (cap proviso above). Empty (with the right schema) before the
    * first batch commits. */
  def pairsView(spark: SparkSession, outDir: String): DataFrame =
    readOrEmpty(spark, s"$outDir/pairs", pairSchema)
      .select(col("doc_a"), col("doc_b"), col("shared_chunks"),
        col("shared_bytes"))

  /** The accumulated chunk index — the [[Dedup.cdcChunkIndex]]
    * relation over every committed batch, directly consumable by the
    * batch delta route ([[Dedup.cdcOverlapDelta]]). */
  def chunkIndexView(spark: SparkSession, outDir: String): DataFrame =
    readOrEmpty(spark, s"$outDir/chunks", chunkSchema)
      .select(col("fp"), col("len"), col("doc_id"))
}
