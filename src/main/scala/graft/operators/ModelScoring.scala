package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the one corpus-pipeline stage that is
  * legitimately NOT a Catalyst expression: a learned classifier
  * (fastText-style quality model, toxicity filter, educational-value
  * scorer) whose weights live outside the plan. The seam follows
  * [[Multimodal.MediaDecoder]]: a `Serializable` boundary trait with a
  * deterministic stub, so the Spark-side plumbing — typed
  * `mapPartitions`, per-task model initialization, bounded-size
  * vectorized batches — is real and tested, and a deployment swaps in
  * a weights-backed implementation without touching the operator.
  *
  * The vectorized-batch contract (what a real inference runtime needs):
  *  - [[QualityClassifier.open]] runs once per task before any scoring
  *    — load weights/sessions there, not per row;
  *  - [[QualityClassifier.scoreBatch]] receives up to `batchSize`
  *    documents per call (the operator buffers at most one batch, never
  *    the partition) and must return exactly one aligned score per
  *    input — enforced, so a ragged implementation fails loudly instead
  *    of mis-assigning scores;
  *  - scores are pure per-document functions: batch boundaries carry no
  *    state, so partitioning and batch size never change results.
  *
  * Scale shape: one map-side pass, no shuffle; document text never
  * leaves its scan partition and only (id, score, label) rows flow
  * downstream. This is the same execution shape `mapInPandas` gives a
  * Python model runner — expressed as a typed JVM seam. */
object ModelScoring {

  /** Classifier boundary. Implementations must be thread-safe across
    * tasks ([[open]] may run concurrently on many tasks). */
  trait QualityClassifier extends Serializable {
    /** Per-task initialization hook (weight loading); default no-op. */
    def open(): Unit = ()
    /** Score a batch of documents (null text possible). MUST return
      * exactly `texts.length` scores, index-aligned. */
    def scoreBatch(texts: Array[String]): Array[Double]
  }

  /** STUB model: a deterministic hashed-bag-of-words "classifier" whose
    * exact arithmetic a SQL engine can replay (the DuckDB oracle
    * recomputes it end-to-end). Each whitespace token hashes to a unit
    * weight in [0,1) via the same code-point poly fold + LCG double mix
    * as [[Corpus.hashUnit]]; the document score is the in-order mean
    * (left-to-right summation, so doubles are bit-identical across
    * engines). Null/empty documents score 0. Swap for a weights-backed
    * model in deployment; only [[scoreBatch]] changes. */
  object StubClassifier extends QualityClassifier {
    private val P = 1000000007L

    private[operators] def tokenUnit(tok: String): Double = {
      var h = 0L
      val it = tok.codePoints().iterator()
      while (it.hasNext) h = (h * 131L + it.nextInt()) % P
      ((h * 1103515245L + 12345L) % P * 69069L + 1L) % P / 1000000007.0
    }

    private[operators] def scoreOne(text: String): Double = {
      if (text == null) return 0.0
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) 0.0
      else {
        var s = 0.0
        toks.foreach(t => s += tokenUnit(t))
        s / toks.length
      }
    }

    def scoreBatch(texts: Array[String]): Array[Double] = texts.map(scoreOne)
  }

  /** Score every document: (doc_id, score rounded to 6 decimals, label
    * = "keep"/"drop" by `keepThreshold` on the rounded score). See the
    * object doc for the batch contract `clf` is held to. */
  def scoreDocuments(docs: DataFrame,
      clf: QualityClassifier = StubClassifier,
      keepThreshold: Double = 0.5, batchSize: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        clf.open()
        it.grouped(batchSize).flatMap { chunk =>
          val scores = clf.scoreBatch(chunk.map(_._2).toArray)
          require(scores.length == chunk.length,
            s"QualityClassifier returned ${scores.length} scores for a " +
              s"batch of ${chunk.length} documents — must be aligned")
          chunk.iterator.zip(scores.iterator)
            .map { case ((id, _), s) => (id, s) }
        }
      }
      .toDF("doc_id", "raw")
      .select(col("doc_id"), round(col("raw"), 6).as("score"))
      .select(col("doc_id"), col("score"),
        when(col("score") >= keepThreshold, "keep").otherwise("drop")
          .as("label"))
  }
}
