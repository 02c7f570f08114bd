package graft.streaming

import org.apache.hadoop.fs.Path
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
  * '''Index layout — partition-pruned probes, bounded file count.'''
  * A per-trigger stream cannot pay a full index scan per batch (a
  * batch delta route pays it once per RUN — fine; a 3-second trigger
  * pays it forever), nor accrete one parquet dir per batch_id
  * unboundedly (the classic streaming small-files curve). So the
  * index is two-tiered, the [[graft.operators.IvfIndex]] discipline:
  *
  *  - '''recent tier''' `outDir/chunks/batch_id=N/bucket=B/` — each
  *    batch's keys, sub-partitioned by fingerprint bucket
  *    `pmod(fp, nBuckets)`; dynamic overwrite keeps replays
  *    idempotent.
  *  - '''base tier''' `outDir/chunks_base/e<E>_upto<N>/bucket=B/` —
  *    every `compactEvery` batches, committed recent dirs fold into a
  *    new epoch directory (bucket-partitioned), then the old epoch
  *    and the folded batch dirs are deleted. The dir name carries the
  *    epoch E and the highest folded batch id N; readers pick the
  *    HIGHEST epoch that finished writing (parquet `_SUCCESS`
  *    marker), so a torn compaction is invisible and a crash between
  *    commit and cleanup leaves only ignorable garbage: recent dirs
  *    `batch_id ≤ N` are never read again (`batch_id > N` filter) and
  *    are swept by the next compaction. Only batches `≤ current − 1`
  *    are ever folded — they are checkpoint-committed, so a replayed
  *    batch can never find its own keys in the base tier. The fold
  *    leans on exactly that checkpoint guarantee: once batches are
  *    folded, their per-batch identity is gone, so re-running the
  *    stream over the same outDir with a FRESH checkpoint is
  *    supported only before the first compaction — wipe outDir and
  *    checkpoint together.
  *
  * Probes read `base(bucket ∈ batch's buckets)` ∪
  * `recent(N < batch_id < current, same buckets)` — both bucket
  * filters are partition filters, so the scan touches only the
  * directories that can contain a matching fingerprint; with the
  * key-restricted join inside [[Dedup.cdcOverlapIncrement]], total
  * per-batch cost is ∝ batch keys + matching postings.
  *
  * `nBuckets` is baked into the on-disk partition values, so it is
  * recorded once at `outDir/cdc_meta` and later sinks on the same
  * outDir must match (enforced at start).
  *
  * '''Consistency of the views''': the pairs and chunks writes of one
  * batch are two separate commits (plus compaction's deletes), atomic
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

  private val chunkSchema =
    "fp bigint, len int, doc_id bigint, batch_id bigint, bucket int"
  private val baseSchema =
    "fp bigint, len int, doc_id bigint, bucket int"
  private val pairSchema =
    "doc_a bigint, doc_b bigint, shared_chunks bigint, " +
      "shared_bytes bigint, batch_id bigint"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: String): DataFrame =
    if (fs(spark, path).exists(new Path(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** The committed base-tier epochs at `outDir`, newest first:
    * `(epoch, uptoBatch, dirPath)`. Only dirs whose parquet commit
    * finished (`_SUCCESS` present) count — a torn compaction write is
    * invisible. */
  private def baseEpochs(spark: SparkSession,
      outDir: String): Seq[(Long, Long, String)] = {
    val root = new Path(s"$outDir/chunks_base")
    val f = fs(spark, outDir)
    if (!f.exists(root)) return Nil
    val Dir = """e(\d+)_upto(\d+)""".r
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName match {
          case Dir(e, n) if f.exists(new Path(st.getPath, "_SUCCESS")) =>
            Some((e.toLong, n.toLong, st.getPath.toString))
          case _ => None
        }
      }
      .sortBy(-_._1)
  }

  /** Highest committed epoch, or (0, -1, none): batch ids start at 0,
    * so upto = -1 means "nothing folded yet". */
  private def currentBase(spark: SparkSession,
      outDir: String): (Long, Long, Option[String]) =
    baseEpochs(spark, outDir).headOption
      .map { case (e, n, p) => (e, n, Some(p)) }
      .getOrElse((0L, -1L, None))

  /** The corpus chunk-key relation visible to batch `batchId`,
    * bucket-pruned to `buckets` (None = all buckets — the full-view
    * read): base tier at the current epoch ∪ recent batch dirs in
    * (upto, batchId). Both bucket predicates and the batch_id
    * predicate are PARTITION filters — the scan reads only matching
    * directories. */
  private[graft] def corpusKeys(spark: SparkSession, outDir: String,
      batchId: Long, buckets: Option[Seq[Int]]): DataFrame = {
    val (_, upto, baseDir) = currentBase(spark, outDir)
    def pruned(df: DataFrame): DataFrame = buckets match {
      case Some(bs) => df.filter(col("bucket").isin(bs.map(Int.box): _*))
      case None => df
    }
    val base = baseDir match {
      case Some(p) => pruned(spark.read.schema(baseSchema).parquet(p))
      case None => readOrEmpty(spark, s"$outDir/__none__", baseSchema)
    }
    val recent = pruned(
      readOrEmpty(spark, s"$outDir/chunks", chunkSchema)
        .filter(col("batch_id") > upto && col("batch_id") < batchId))
    base.select(col("fp"), col("len"), col("doc_id"))
      .unionByName(recent.select(col("fp"), col("len"), col("doc_id")))
  }

  /** Fold committed recent batches (ids ≤ `upTo`) plus the current
    * base epoch into a new epoch dir, then delete the superseded
    * epoch(s) and the folded batch dirs. Idempotent and crash-safe:
    * the new epoch becomes visible only when its `_SUCCESS` lands
    * (readers pick the highest committed epoch), and every delete
    * removes data that is already unreadable — a crash at any point
    * leaves a correct index plus sweepable garbage. */
  private def compact(spark: SparkSession, outDir: String,
      upTo: Long): Unit = {
    val (epoch, folded, _) = currentBase(spark, outDir)
    if (folded >= upTo) return // a crashed attempt already committed
    val next = s"$outDir/chunks_base/e${epoch + 1}_upto$upTo"
    corpusKeys(spark, outDir, batchId = upTo + 1, buckets = None)
      .withColumn("bucket",
        pmod(col("fp"), lit(readNBuckets(spark, outDir))).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(next)
    val f = fs(spark, outDir)
    // superseded epochs (committed or torn) and folded recent dirs
    baseEpochs(spark, outDir).filter(_._1 <= epoch)
      .foreach { case (_, _, p) => f.delete(new Path(p), true); () }
    val chunksRoot = new Path(s"$outDir/chunks")
    if (f.exists(chunksRoot))
      f.listStatus(chunksRoot).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch_id=") &&
          st.getPath.getName.stripPrefix("batch_id=").toLongOption
            .exists(_ <= upTo))
        .foreach(st => { f.delete(st.getPath, true); () })
  }

  private def countRecentDirs(spark: SparkSession, outDir: String,
      upto: Long, below: Long): Int = {
    val root = new Path(s"$outDir/chunks")
    val f = fs(spark, outDir)
    if (!f.exists(root)) 0
    else f.listStatus(root).count(st => st.isDirectory &&
      st.getPath.getName.startsWith("batch_id=") &&
      st.getPath.getName.stripPrefix("batch_id=").toLongOption
        .exists(b => b > upto && b < below))
  }

  /** Record `nBuckets` once per outDir; later sinks must match — the
    * modulus is baked into every on-disk partition value, so a
    * mismatch would silently mis-prune probes. */
  private def ensureNBuckets(spark: SparkSession, outDir: String,
      nBuckets: Int): Unit = {
    val path = s"$outDir/cdc_meta"
    if (fs(spark, outDir).exists(new Path(path))) {
      val stored = readNBuckets(spark, outDir)
      require(stored == nBuckets,
        s"StreamCdc: index at $outDir was built with nBuckets=$stored, " +
          s"got $nBuckets — the bucket modulus cannot change")
    } else {
      import spark.implicits._
      Seq(nBuckets).toDF("n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  private def readNBuckets(spark: SparkSession, outDir: String): Int =
    spark.read.parquet(s"$outDir/cdc_meta")
      .select(col("n_buckets").cast("int")).collect()(0).getInt(0)

  /** Start the sink: for each micro-batch of documents, emit overlap
    * pairs touching the batch and grow the chunk index. `docs` must
    * carry a long id column and a text column. `nBuckets` fixes the
    * fingerprint-bucket partitioning of the index (immutable per
    * outDir); `compactEvery` bounds the recent tier — when that many
    * committed batch dirs accumulate, they fold into the base tier. */
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
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        ensureNBuckets(spark, outDir, nBuckets)
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
          val corpus = corpusKeys(spark, outDir, batchId, Some(buckets))
            .withColumnRenamed("doc_id", idCol)
          Dedup.cdcOverlapIncrement(
              keys.select(col("fp"), col("len"), col(idCol)), corpus,
              idCol, minSharedBytes, maxDocsPerChunk)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/pairs")
          keys.select(col("fp"), col("len"), col(idCol).as("doc_id"),
              col("bucket"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id", "bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$outDir/chunks")
          // fold committed recent batches (strictly older than this
          // one — they can never replay) once enough accumulate
          val (_, upto, _) = currentBase(spark, outDir)
          if (countRecentDirs(spark, outDir, upto, batchId) >=
              compactEvery)
            compact(spark, outDir, upTo = batchId - 1)
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
    corpusKeys(spark, outDir, batchId = Long.MaxValue, buckets = None)
}
