package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Streaming k-means assignment — the ingestion-time mirror of
  * [[graft.operators.KMeans.assign]], the tokenizer-seam discipline
  * applied to clustering: centroids are TRAINED offline
  * ([[graft.operators.KMeans.trainCentroids]], shipped via
  * `saveCentroids`), FROZEN, and every arriving vector is labeled by a
  * PURE PROJECTION — the k·dim centroid table rides the plan as a
  * literal for the doc-local left-folded distance argmin. No state
  * store, no stream-side shuffle, no stream-batch join; nothing grows
  * with the stream. This is the online half of cluster-balanced
  * corpus routing (label on ingest, budget per cluster downstream).
  *
  * The centroid literal is bounded and VALIDATED by the
  * `collectCentroids` fetch (cap, 0..k−1 completeness, one
  * dimensionality) before anything is collected.
  */
object StreamKMeansAssign {

  /** Add `cluster` (int) and `d2` (squared distance in input units,
    * round 6) columns to a (possibly streaming) frame. Rows whose
    * embedding fails the validity filter (null / empty / null
    * element) get a NULL cluster and d2 instead of being dropped —
    * a stream must not silently lose rows. Batch-equivalence on valid
    * rows: [[graft.operators.KMeans.assign]] (StreamKMeansAssignSpec). */
  def annotate(stream: DataFrame, centroids: DataFrame,
      embCol: String = "embedding"): DataFrame = {
    require(!stream.columns.contains("cluster") &&
      !stream.columns.contains("d2"),
      "StreamKMeansAssign.annotate: input already carries cluster/d2")
    val cents = KMeans.collectCentroids(centroids)
    val cl = typedlit(cents)
    // dimension mismatches annotate NULL like every other invalid row
    val ok = KMeans.validDim(col(embCol), cents.head.length)
    // _d materializes as its own projection so the k·dim distance fold
    // evaluates ONCE per row (CollapseProject keeps a multiply-
    // referenced non-cheap expression in its own Project; inlining the
    // fold into cluster AND d2 would evaluate it three times)
    stream
      .withColumn("_d",
        when(ok, KMeans.distances(KMeans.quantized(col(embCol)), cl)))
      .withColumn("cluster",
        (array_position(col("_d"), array_min(col("_d"))) - 1).cast("int"))
      .withColumn("d2",
        round(array_min(col("_d")) / lit(KMeans.Scale2), 6))
      .drop("_d")
  }
}
