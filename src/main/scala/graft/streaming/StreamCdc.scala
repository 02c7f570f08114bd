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
  *     append to the chunk index, both batch_id-partitioned with
  *     dynamic partition overwrite so a replayed batch overwrites
  *     exactly its own contribution (the [[RegisterStream.dualSink]]
  *     idempotence discipline).
  *
  * '''Index layout and maintenance''' live in [[TieredIndex]]: a
  * recent tier of per-batch dirs sub-partitioned by fingerprint
  * bucket `pmod(fp, nBuckets)`, folded every `compactEvery` batches
  * into LSM size-tiered base epochs (O(log n) live epochs; a fold
  * reads only the recent dirs it folds, a merge only the two epochs
  * it merges — the base is never rewritten wholesale except at its
  * own doubling point, so per-trigger maintenance cost is bounded by
  * similar-sized tiers instead of O(corpus)). Probes read
  * `liveEpochs(bucket ∈ batch's buckets)` ∪ `recent(upto < batch_id <
  * current, same buckets)` — the bucket predicates are PARTITION
  * filters, so the scan touches only directories that can contain a
  * matching fingerprint; with the key-restricted join inside
  * [[Dedup.cdcOverlapIncrement]], total per-batch cost is ∝ batch
  * keys + matching postings. Crash safety (torn-fold invisibility via
  * `_SUCCESS`-gated epoch selection, replay idempotence, restarts
  * across folds) is the [[TieredIndex]] contract; only
  * checkpoint-committed batches fold, so a replayed batch never meets
  * its own keys. Once batches are folded their per-batch identity is
  * gone, so re-running the stream over the same outDir with a FRESH
  * checkpoint is supported only before the first fold — wipe outDir
  * and checkpoint together.
  *
  * `nBuckets` is baked into the on-disk partition values, so it is
  * recorded once at `outDir/index_meta` and later sinks on the same
  * outDir must match (enforced at start, atomically; the pre-bucket
  * flat layout is rejected loudly — see
  * [[TieredIndex.ensureNBuckets]]).
  *
  * '''Consistency of the views''': the pairs and chunks writes of one
  * batch are two separate commits (plus maintenance deletes), atomic
  * only per-directory. [[pairsView]] and [[chunkIndexView]] are
  * therefore consistent BETWEEN batches — a reader concurrent with an
  * in-flight or replaying batch can observe that batch's partition
  * mid-overwrite. Readers needing a stable view should read while the
  * query is stopped or exclude the latest batch_id.
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

  private val keySchema = "fp bigint, len int, doc_id bigint"
  private val pairSchema =
    "doc_a bigint, doc_b bigint, shared_chunks bigint, " +
      "shared_bytes bigint, batch_id bigint"

  private def index(outDir: String) = new TieredIndex(outDir, keySchema)

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: String): DataFrame =
    if (new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** The corpus chunk-key relation visible to batch `batchId`,
    * bucket-pruned to `buckets` (None = all buckets) — see
    * [[TieredIndex.corpusKeys]]. */
  private[graft] def corpusKeys(spark: SparkSession, outDir: String,
      batchId: Long, buckets: Option[Seq[Int]]): DataFrame =
    index(outDir).corpusKeys(spark, batchId, buckets)

  /** Start the sink: for each micro-batch of documents, emit overlap
    * pairs touching the batch and grow the chunk index. `docs` must
    * carry a long id column and a text column. `nBuckets` fixes the
    * fingerprint-bucket partitioning of the index (immutable per
    * outDir); `compactEvery` bounds the recent tier — when that many
    * committed batch dirs accumulate, they fold into a base epoch
    * (size-tiered merges keep the base at O(log n) epochs). */
  def sink(docs: DataFrame, outDir: String, checkpoint: String,
      w: Int = 16, maskBits: Int = 6, minLen: Int = 24,
      minSharedBytes: Int = 48, maxDocsPerChunk: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      minChunk: Int = 1, maxChunk: Int = Int.MaxValue,
      nBuckets: Int = 64, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(nBuckets >= 1,
      s"StreamCdc: nBuckets must be >= 1, got $nBuckets")
    require(compactEvery >= 2,
      s"StreamCdc: compactEvery must be >= 2, got $compactEvery")
    val idx = index(outDir)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        idx.ensureNBuckets(spark, nBuckets)
        val keys = Dedup.cdcChunkIndex(batch, idCol, textCol, w,
            maskBits, minLen, minChunk, maxChunk)
          .withColumn("bucket",
            pmod(col("fp"), lit(nBuckets)).cast("int"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // the batch's fingerprint buckets (≤ nBuckets values — a
          // bounded collect) become partition filters on the index
          // read: only directories that can hold a matching key are
          // scanned
          val buckets = keys.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          // strictly-older batches only: a replayed batch must not see
          // its own crashed partial write as "corpus"
          val corpus = idx.corpusKeys(spark, batchId, Some(buckets))
            .withColumnRenamed("doc_id", idCol)
          Dedup.cdcOverlapIncrement(
              keys.select(col("fp"), col("len"), col(idCol)), corpus,
              idCol, minSharedBytes, maxDocsPerChunk)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/pairs")
          idx.append(keys.select(col("fp"), col("len"),
            col(idCol).as("doc_id"), col("bucket")), batchId)
          // fold committed recent batches (strictly older than this
          // one — they can never replay) once enough accumulate, plus
          // at most one size-tiered merge
          idx.maintain(spark, batchId, compactEvery)
        } finally { keys.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** All overlap pairs seen so far — equal to batch
    * [[Dedup.cdcOverlapPairs]] over the union of committed batches
    * (cap proviso above; consistent only between batches — see the
    * object doc). Empty (with the right schema) before the first
    * batch commits. */
  def pairsView(spark: SparkSession, outDir: String): DataFrame =
    readOrEmpty(spark, s"$outDir/pairs", pairSchema)
      .select(col("doc_a"), col("doc_b"), col("shared_chunks"),
        col("shared_bytes"))

  /** The accumulated chunk index — the [[Dedup.cdcChunkIndex]]
    * relation over every committed batch (base ∪ recent tiers),
    * directly consumable by the batch delta route
    * ([[Dedup.cdcOverlapDelta]]). Consistent only between batches —
    * see the object doc. */
  def chunkIndexView(spark: SparkSession, outDir: String): DataFrame =
    index(outDir).corpusKeys(spark, batchId = Long.MaxValue,
      buckets = None)
}
