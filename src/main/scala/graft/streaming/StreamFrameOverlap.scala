package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaDecoder, FakeDecoder, MediaRecord}

/** Streaming frame-level media overlap — the ingestion-time face of
  * [[graft.operators.Multimodal.frameOverlapPairs]], completing the
  * frame family's batch/index/delta/stream square (the sub-file
  * reuse detector: re-cut and partially-reused footage surfaces as
  * media arrive, next to [[StreamMediaDedup]]'s whole-file pairs).
  * Per micro-batch:
  *
  *  1. decode the batch ONCE map-side to its frame-posting relation
  *     ([[Multimodal.frameIndex]]'s schema `(media_id, fk)`) —
  *     payloads never shuffle, never persist;
  *  2. probe the accumulated posting index UNION the batch's own
  *     postings ([[Multimodal.frameOverlapIncrement]]): key-equality
  *     candidates, boilerplate cap over the union frequency as of
  *     this batch, each pair emitted exactly once when its later
  *     member arrives (corpus-internal pairs cannot form);
  *  3. pairs append to `outDir/pairs`, the batch's postings append to
  *     the index — both batch_id-partitioned with dynamic partition
  *     overwrite, so a replayed batch overwrites exactly its own
  *     contribution.
  *
  * The index is a [[TieredIndex]] (the [[StreamCdc]] /
  * [[StreamMediaDedup]] discipline): a recent tier of per-batch dirs
  * sub-partitioned by key bucket `pmod(hash(fk), nBuckets)`, folded
  * every `compactEvery` batches into LSM size-tiered base epochs.
  * Probes read only the bucket partitions the batch's own keys hash
  * to — partition filters on every index scan — so per-batch cost is
  * ∝ batch frames + matching postings, and maintenance is bounded by
  * the tiers it merges, never O(corpus). Crash safety (torn-fold
  * invisibility, replay idempotence, restarts across folds) is the
  * [[TieredIndex]] contract; `nBuckets` is immutable per outDir.
  *
  * '''Law''' ([[StreamCdc]]'s cap-crossing contract): after any
  * prefix of batches, [[pairsView]] EQUALS batch
  * [[Multimodal.frameOverlapPairs]] over the union of those batches,
  * PROVIDED no frame key crossed `maxMediaPerFrame` after a pair
  * sharing it was emitted — a crossing makes the deviation one-sided
  * (the stream may keep pairs / count keys the recompute drops,
  * never the reverse). Media ids must be globally unique across
  * batches. Views are consistent only between batches (two commits
  * per batch — the [[StreamCdc]] caveat). */
object StreamFrameOverlap {

  private val keySchema = "media_id bigint, fk array<float>"
  private val pairSchema =
    "media_a bigint, media_b bigint, shared_frames bigint, " +
      "batch_id bigint"

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

  /** The corpus frame-posting relation visible to batch `batchId`,
    * bucket-pruned to `buckets` — see [[TieredIndex.corpusKeys]]. */
  private[graft] def corpusKeys(spark: SparkSession, outDir: String,
      batchId: Long, buckets: Option[Seq[Int]]): DataFrame =
    index(outDir).corpusKeys(spark, batchId, buckets)

  /** Start the sink: for each micro-batch of media, emit frame-level
    * overlap pairs touching the batch (≥ `minSharedFrames` shared
    * near-identical frames) and grow the posting index. */
  def sink(media: Dataset[MediaRecord], outDir: String,
      checkpoint: String, stride: Int = 1, minSharedFrames: Int = 2,
      maxMediaPerFrame: Int = 64, decoder: MediaDecoder = FakeDecoder,
      nBuckets: Int = 64, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(nBuckets >= 1,
      s"StreamFrameOverlap: nBuckets must be >= 1, got $nBuckets")
    require(compactEvery >= 2,
      s"StreamFrameOverlap: compactEvery must be >= 2, got " +
        s"$compactEvery")
    val idx = index(outDir)
    media.writeStream
      .foreachBatch { (batch: Dataset[MediaRecord], batchId: Long) =>
        val spark = batch.sparkSession
        idx.ensureNBuckets(spark, nBuckets)
        // decode once; only fixed-width (media_id, fk) postings persist
        val keys = Multimodal.frameIndex(batch, stride, decoder)
          .withColumn("bucket",
            pmod(hash(col("fk")), lit(nBuckets)).cast("int"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // the batch's key buckets (≤ nBuckets values — a bounded
          // collect) become partition filters on the index read
          val buckets = keys.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          // strictly-older batches only: a replayed batch must not
          // see its own crashed partial write as "corpus"
          val corpus = idx.corpusKeys(spark, batchId, Some(buckets))
          Multimodal.frameOverlapIncrement(keys.drop("bucket"), corpus,
              minSharedFrames, maxMediaPerFrame)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/pairs")
          idx.append(keys, batchId)
          idx.maintain(spark, batchId, compactEvery)
        } finally { keys.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** All overlap pairs seen so far — equal to batch
    * [[Multimodal.frameOverlapPairs]] over the union of committed
    * batches under the cap proviso (see object doc; consistent only
    * between batches). Empty (with the right schema) before the first
    * batch commits. */
  def pairsView(spark: SparkSession, outDir: String): DataFrame =
    readOrEmpty(spark, s"$outDir/pairs", pairSchema)
      .select(col("media_a"), col("media_b"), col("shared_frames"))

  /** The accumulated posting index — the [[Multimodal.frameIndex]]
    * relation over every committed batch, directly consumable by the
    * batch delta route ([[Multimodal.frameOverlapDelta]]). Consistent
    * only between batches. */
  def frameIndexView(spark: SparkSession, outDir: String): DataFrame =
    index(outDir).corpusKeys(spark, batchId = Long.MaxValue,
      buckets = None)
}
