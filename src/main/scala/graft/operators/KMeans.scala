package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, built for
  * cluster-balanced ("semantic diversity") sampling of training
  * corpora — the clustering counterpart of [[Similarity]]'s IVF coarse
  * quantizer, but as a first-class operator whose assignments are
  * DETERMINISTIC and oracle-replayable on any IEEE engine:
  *
  *   - vectors quantize to integer-valued doubles by
  *     `floor(v · 2^20)` — a POWER-OF-TWO scale, so the product is an
  *     exact float operation (exponent shift) and floor is exact on
  *     both engines (no decimal-rounding-mode coupling);
  *   - centroid components are `exact-integer-sum / count` — sums of
  *     integers stay exact in doubles far past any corpus size that
  *     fits a cluster (< 2^53), so the ONE division is the only
  *     rounding and both engines round it identically;
  *   - a vector's distance to a centroid folds (x_i − c_i)² LEFT TO
  *     RIGHT over dimensions (`aggregate` here, `list_reduce` in the
  *     oracle — both contractually sequential), so every partial is
  *     bit-identical; argmin ties break to the SMALLEST cluster id
  *     (first position of the min);
  *   - seeds are the k smallest ids' vectors; an emptied cluster keeps
  *     its previous centroid.
  *
  * Scale shape: assignment is ONE projection per iteration — the k·dim
  * centroid table rides the plan as a literal (the [[Similarity]]
  * "centroids ride the plan" discipline), so the corpus never
  * shuffles for assignment. The update is one (cluster, dim)-keyed
  * aggregate of map-side-combinable integer sums (k·dim bounded rows
  * collected to the driver). Iterations are a fixed, small count —
  * exactly the production regime (a handful of Lloyd rounds over a
  * sample or the full corpus, then freeze).
  */
object KMeans {

  /** 2^20 — the quantization scale (exact in binary). */
  private val Scale = 1048576.0
  /** 2^40 — distance renormalization back to input units². */
  private val Scale2 = Scale * Scale

  /** Integer-valued quantized copy of the embedding, as doubles. */
  private def quantized(embCol: Column): Column =
    // floor on DoubleType returns BIGINT in Spark — cast back so the
    // whole pipeline stays in (integer-valued) doubles, the oracle's
    // arithmetic domain
    transform(embCol,
      v => floor(v.cast("double") * lit(Scale)).cast("double"))

  /** Valid-vector filter: non-null, no null elements, length ≥ 1. */
  private def valid(embCol: Column): Column =
    embCol.isNotNull && size(embCol) >= 1 &&
      size(filter(embCol, v => v.isNull)) === 0

  /** Distances of quantized vector `x` to every centroid in `cents`
    * (literal array-of-arrays), folded left-to-right per dimension. */
  private def distances(x: Column, cents: Column): Column =
    transform(cents, c =>
      aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v))

  /** Lloyd assignments after `iters` rounds of k-means with the
    * determinism contract above. Output: (idCol, `cluster` int,
    * `d2` = round(distance / 2^40, 6) — squared distance in input
    * units). Rows failing [[valid]] are dropped. */
  def lloyd(embs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 65536, s"lloyd: k must be in [1, 65536], got $k")
    require(iters >= 1 && iters <= 100,
      s"lloyd: iters must be in [1, 100], got $iters")
    val base = embs
      .filter(valid(col(embCol)))
      .select(col(idCol).as("_id"), quantized(col(embCol)).as("_x"))
    // seeds: the k smallest ids' vectors (bounded driver collect)
    val seedRows = base.orderBy(col("_id")).limit(k)
      .select(col("_x")).collect()
    require(seedRows.length == k,
      s"lloyd: corpus has ${seedRows.length} valid vectors, need >= $k")
    var cents: Seq[Seq[Double]] =
      seedRows.map(_.getSeq[Double](0).toSeq).toSeq
    val dim = cents.head.length
    require(cents.forall(_.length == dim),
      "lloyd: seed vectors must share one dimensionality")
    var it = 0
    while (it < iters) {
      val cl = typedlit(cents)
      // one (cluster, dim)-keyed aggregate of exact integer sums;
      // k·dim rows collected — bounded by construction
      val sums = base
        .withColumn("_d", distances(col("_x"), cl))
        .select((array_position(col("_d"), array_min(col("_d"))) - 1)
          .as("_cl"), posexplode(col("_x")).as(Seq("_pos", "_v")))
        .groupBy(col("_cl"), col("_pos"))
        .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n"))
        .collect()
      val next = Array.tabulate(k)(c => cents(c).toArray)
      sums.groupBy(_.getLong(0).toInt).foreach { case (c, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach { r =>
          // exact integer sum (read back as double), ONE division
          arr(r.getInt(1)) = r.getDouble(2) / r.getLong(3).toDouble
        }
        next(c) = arr
      }
      cents = next.map(_.toSeq).toSeq
      it += 1
    }
    val cl = typedlit(cents)
    base
      .withColumn("_d", distances(col("_x"), cl))
      .select(col("_id").as(idCol),
        (array_position(col("_d"), array_min(col("_d"))) - 1)
          .cast("int").as("cluster"),
        round(array_min(col("_d")) / lit(Scale2), 6).as("d2"))
  }

  /** Per-cluster summary of a [[lloyd]] assignment: size and inertia
    * (Σ d2 through an exact DECIMAL(18,6) sum — order-independent and
    * engine-portable, the repo's double-aggregation convention — cast
    * back to double). Output: (cluster, n, inertia). */
  def summary(assignments: DataFrame): DataFrame =
    assignments
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("d2").cast("decimal(18,6)")).cast("double").as("inertia"))

  /** Cluster-balanced exemplar sample: the `m` vectors CLOSEST to
    * their centroid per cluster ((d2 ASC, id ASC) — deterministic),
    * via the map-side-combinable bounded-heap aggregate (never a
    * single-task per-cluster window sort). Output: (cluster, rnk,
    * idCol, d2). */
  def balancedSample(assignments: DataFrame, m: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(m >= 1 && m <= 100000,
      s"balancedSample: m must be in [1, 1e5], got $m")
    assignments
      .groupBy(col("cluster"))
      .agg(graft.functions.TopKPairs.topK(
        col("d2") * lit(-1.0), col(idCol), m).as("_top"))
      .select(col("cluster"), posexplode(col("_top")))
      .select(col("cluster"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as(idCol),
        (col("col.score") * lit(-1.0)).as("d2"))
  }
}
