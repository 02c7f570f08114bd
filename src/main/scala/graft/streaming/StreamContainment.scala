package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

import graft.operators.Dedup

/** Streaming containment join — the x117 delta containment composed
  * online with the [[StreamCorpusLoop]] delta-store protocol: one
  * `foreachBatch` sink that, per micro-batch,
  *
  *   1. reads the growing prefix index (per-doc (id, ng, sz, prefix)
  *      rows plus the corpus (gram, df) relation) from `_SUCCESS`-gated
  *      `delta=`/`base=` parquet directories STRICTLY BELOW the batch;
  *   2. emits every ordered containment pair TOUCHING the batch via
  *      [[Dedup.containmentPairsDelta]] — delta-contained-in-(corpus ∪
  *      delta) and corpus-contained-in-delta, never corpus×corpus —
  *      appended as the batch's `pairs/delta=<id>`;
  *   3. appends the batch's own index rows
  *      ([[Dedup.jaccardIndexDelta]], prefixes ranked under the FROZEN
  *      corpus df order — x87) and its (gram, count) df contributions.
  *
  * Exactly-once pair semantics: a qualifying ordered pair (a, b)
  * surfaces in precisely the batch where its LATER-arriving endpoint
  * is the delta (the earlier doc is then in the index; same-batch
  * pairs surface via the delta×delta route) — so the UNION of all
  * `pairs` deltas over a closed corpus equals batch
  * [[Dedup.containmentPairs]] over that corpus
  * (`StreamContainmentSpec` proves it, incl. restart and
  * post-compaction).
  *
  * Replay safety is inherited from the protocol: reads see only
  * complete deltas strictly below the batch id, writes overwrite the
  * batch's own directories. [[compact]] folds deltas behind the
  * committed watermark — pairs and index rows by plain union, the df
  * relation by RE-AGGREGATION (per-batch gram counts sum into one
  * row per gram), keeping listing cost and file counts bounded; wire
  * it with `sink(..., compactEvery = K)` exactly like the corpus loop.
  *
  * Scale shape: per-batch cost ∝ delta size + match rate (the
  * containmentPairsDelta contract); store reads are column-pruned
  * parquet scans; nothing is ever rewritten except at compaction.
  */
object StreamContainment {

  private val indexSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("ng", ArrayType(LongType, containsNull = false)),
    StructField("sz", IntegerType),
    StructField("prefix", ArrayType(LongType, containsNull = false))))
  private val gramDfSchema = StructType(Seq(
    StructField("gram", LongType), StructField("df", LongType)))
  private val pairsSchema = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType),
    StructField("containment", DoubleType)))

  private def indexDir(dir: String) = s"$dir/cindex"
  private def gramDir(dir: String) = s"$dir/cgramdf"
  private def pairsDir(dir: String) = s"$dir/pairs"

  /** The corpus (gram, df) relation as of `below`: per-batch counts
    * summed. The base written by [[compact]] is already aggregated;
    * re-aggregating (base ∪ deltas) is the same sum. */
  private def gramDfBelow(spark: SparkSession, dir: String,
      below: Option[Long]): DataFrame =
    StreamCorpusLoop.readStore(spark, gramDir(dir), gramDfSchema, below)
      .groupBy(col("gram")).agg(sum(col("df")).as("df"))

  /** Fold one micro-batch: emit its touching pairs, then append its
    * index rows and df contributions (the testable core; [[sink]]
    * adapts it to `foreachBatch`). */
  def foldBatch(dir: String, batch: DataFrame, batchId: Long,
      threshold: Double = 0.9, n: Int = 12, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val corpusDocs = StreamCorpusLoop.readStore(
      spark, indexDir(dir), indexSchema, Some(batchId))
    val corpusDf = gramDfBelow(spark, dir, Some(batchId))
    val index = Dedup.JaccardIndex(corpusDocs, corpusDf, threshold, n)
    Dedup.containmentPairsDelta(batch, index, idCol, textCol)
      .write.mode("overwrite")
      .parquet(s"${pairsDir(dir)}/delta=$batchId")
    Dedup.jaccardIndexDelta(batch, corpusDf, threshold, n, idCol, textCol)
      .write.mode("overwrite")
      .parquet(s"${indexDir(dir)}/delta=$batchId")
    batch
      .select(graft.functions.ShingleExprs
        .shingleSetChars(col(textCol), n).as("ng"))
      .filter(col("ng").isNotNull && size(col("ng")) >= 1)
      .select(explode(col("ng")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite")
      .parquet(s"${gramDir(dir)}/delta=$batchId")
  }

  /** `foreachBatch` adapter; `compactEvery = K` (0 = manual) compacts
    * behind watermark N after folding batch N % K == 0 — safe inside
    * the serialized callback (the [[StreamCorpusLoop.sink]] contract). */
  def sink(dir: String, threshold: Double = 0.9, n: Int = 12,
      idCol: String = "doc_id", textCol: String = "text",
      compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      foldBatch(dir, batch, batchId, threshold, n, idCol, textCol)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        compact(batch.sparkSession, dir, below = batchId)
    }

  /** Fold every delta strictly below `below` into `base=<below>` per
    * store and prune the subsumed directories — the
    * [[StreamCorpusLoop.compact]] contract (atomic base commit before
    * deletion, idempotent re-runs, byte-identical reads at or past
    * `below`), with the df store compacted to its AGGREGATED form. */
  def compact(spark: SparkSession, dir: String, below: Long): Unit = {
    def one(sub: String, read: Option[Long] => DataFrame): Unit = {
      val fs = new Path(sub)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val already = StreamCorpusLoop.completeDirs(spark, sub, "base=")
        .exists(_._1 == below)
      if (!already)
        read(Some(below)).write.mode("overwrite").parquet(s"$sub/base=$below")
      (StreamCorpusLoop.completeDirs(spark, sub, "delta=")
          .filter(_._1 < below) ++
        StreamCorpusLoop.completeDirs(spark, sub, "base=")
          .filter(_._1 < below))
        .foreach { case (_, p) => fs.delete(new Path(p), true) }
    }
    one(indexDir(dir), b => StreamCorpusLoop.readStore(
      spark, indexDir(dir), indexSchema, b))
    one(gramDir(dir), b => gramDfBelow(spark, dir, b))
    one(pairsDir(dir), b => StreamCorpusLoop.readStore(
      spark, pairsDir(dir), pairsSchema, b))
  }

  /** Every containment pair emitted so far (the union of complete
    * per-batch outputs) — over a closed corpus, equal to batch
    * [[Dedup.containmentPairs]]. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    StreamCorpusLoop.readStore(spark, pairsDir(dir), pairsSchema, None)

  /** The growing prefix-index relation (id, ng, sz, prefix). */
  def index(spark: SparkSession, dir: String): DataFrame =
    StreamCorpusLoop.readStore(spark, indexDir(dir), indexSchema, None)

  /** The corpus (gram, df) relation (aggregated). */
  def gramDf(spark: SparkSession, dir: String): DataFrame =
    gramDfBelow(spark, dir, None)
}
