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
  private[graft] val Scale = 1048576.0
  /** 2^40 — distance renormalization back to input units². */
  private[graft] val Scale2 = Scale * Scale

  /** Integer-valued quantized copy of the embedding, as doubles. */
  private[graft] def quantized(embCol: Column): Column =
    // floor on DoubleType returns BIGINT in Spark — cast back so the
    // whole pipeline stays in (integer-valued) doubles, the oracle's
    // arithmetic domain
    transform(embCol,
      v => floor(v.cast("double") * lit(Scale)).cast("double"))

  /** Valid-vector filter: non-null, no null elements, length ≥ 1. */
  private[graft] def valid(embCol: Column): Column =
    embCol.isNotNull && size(embCol) >= 1 &&
      size(filter(embCol, v => v.isNull)) === 0

  /** [[valid]] plus the model's dimensionality: a vector of a
    * DIFFERENT length than the centroids would null-pad through
    * zip_with into an all-null distance array — an opaque NPE in the
    * trainer and a silent NULL cluster in assign. Mismatched rows are
    * dropped (batch) or NULL-annotated (stream), by contract. */
  private[graft] def validDim(embCol: Column, dim: Int): Column =
    valid(embCol) && size(embCol) === dim

  /** Distances of quantized vector `x` to every centroid in `cents`
    * (literal array-of-arrays), folded left-to-right per dimension. */
  private[graft] def distances(x: Column, cents: Column): Column =
    transform(cents, c =>
      aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v))

  /** THE Lloyd iteration — the one distributed k-means loop every
    * trainer in the library runs on (this operator's [[trainCentroids]],
    * [[Similarity]]'s IVF coarse quantizer and PQ sub-space codebooks).
    * Generalized to GROUPS so that many quantizers train together in
    * ONE aggregate job per iteration regardless of the group count
    * (IVF+PQ trains the coarse quantizer and all m codebooks in the
    * same 10 passes): `base` carries (`_g` int group id 0..G−1, `_id`,
    * `_x` QUANTIZED integer-valued doubles, uniform length per group),
    * `seeds` one centroid matrix per group in the same quantized
    * units. Per iteration: each row scores against ITS group's
    * centroids (the group matrix selected by `element_at` from one
    * bounded plan literal), argmin ties to the smallest cluster id,
    * then one (group, cluster, dim)-keyed aggregate of exact integer
    * sums — Σ k_g·dim_g bounded rows collected. An emptied cluster
    * keeps its previous centroid. The determinism contract is the
    * object doc's: all arithmetic before the ONE per-component
    * division is exact. */
  private[graft] def lloydIterate(base: DataFrame,
      seeds: Seq[Seq[Seq[Double]]], iters: Int): Seq[Seq[Seq[Double]]] = {
    require(iters >= 1 && iters <= 100,
      s"lloydIterate: iters must be in [1, 100], got $iters")
    require(seeds.nonEmpty && seeds.forall(_.nonEmpty),
      "lloydIterate: every group needs at least one seed centroid")
    var cents = seeds
    var it = 0
    while (it < iters) {
      // assignment through the codegen kernel
      // ([[graft.functions.KMeansOps.nearest]]) — bit-identical to the
      // aggregate(zip_with)/array_position SQL shape the oracle
      // replays (see its determinism contract), ~30× faster than the
      // interpreted higher-order chain at PQ codebook scale
      val sums = base
        .select(col("_g"),
          graft.functions.KMeansExprs.nearest(col("_g"), col("_x"), cents)
            .as("_cl"), posexplode(col("_x")).as(Seq("_pos", "_v")))
        .groupBy(col("_g"), col("_cl"), col("_pos"))
        .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n"))
        .collect()
      // fail-loudly contract of the private API: a null group/cluster/
      // position (possible only if a caller fed null groups or vectors
      // past the valid() filters) must raise here, not silently decode
      // as 0 and corrupt cluster 0's sums
      sums.foreach { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
          "lloydIterate: null group/cluster/position in the assignment " +
            "aggregate — the input carries null groups or vectors")
      }
      val next = cents.map(_.toArray).toArray
      sums.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
        case ((g, c), rows) =>
          val arr = new Array[Double](cents(g)(c).length)
          rows.foreach { r =>
            // exact integer sum (read back as double), ONE division
            arr(r.getInt(2)) = r.getDouble(3) / r.getLong(4).toDouble
          }
          next(g)(c) = arr.toSeq
      }
      cents = next.map(_.toSeq).toSeq
      it += 1
    }
    cents
  }

  /** [[lloydIterate]] over a DRIVER-RESIDENT sample — the index-build
    * regime ([[Similarity]]'s quantizer training collects a bounded,
    * byte-budgeted sample; iterating on it locally replaces 10
    * aggregate jobs with 10 in-memory passes). PROVABLY BIT-IDENTICAL
    * to the distributed route on the same rows: the assignment kernel
    * is the same [[graft.functions.KMeansOps.nearest]] the expression
    * runs, the per-cluster sums are sums of INTEGER-VALUED doubles
    * (exact at any summation order while below 2^53 — which k·dim
    * bounded quantized corpora are by construction), and the one
    * division per component is the same IEEE op. `vecs` carries
    * (group id, quantized vector) pairs; groups and lengths must match
    * `seeds` (the kernel fails loudly otherwise). */
  private[graft] def lloydIterateLocal(vecs: Array[(Int, Array[Double])],
      seeds: Seq[Seq[Seq[Double]]], iters: Int): Seq[Seq[Seq[Double]]] = {
    require(iters >= 1 && iters <= 100,
      s"lloydIterateLocal: iters must be in [1, 100], got $iters")
    require(seeds.nonEmpty && seeds.forall(_.nonEmpty),
      "lloydIterateLocal: every group needs at least one seed centroid")
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val ads = vecs.map { case (g, x) =>
      (g, UnsafeArrayData.fromPrimitiveArray(x))
    }
    var cents = seeds
    var it = 0
    while (it < iters) {
      val (flat, off, ks, dims) = graft.functions.KMeansOps.compile(cents)
      val sums = cents.map(g =>
        Array.ofDim[Double](g.length, g.head.length)).toArray
      val counts = cents.map(g => new Array[Long](g.length)).toArray
      var i = 0
      while (i < ads.length) {
        val (g, ad) = ads(i)
        val c = graft.functions.KMeansOps.nearest(g, ad, flat, off, ks, dims)
        val s = sums(g)(c)
        val x = vecs(i)._2
        var d = 0
        while (d < x.length) { s(d) += x(d); d += 1 }
        counts(g)(c) += 1
        i += 1
      }
      val next = cents.map(_.toArray).toArray
      var g = 0
      while (g < next.length) {
        var c = 0
        while (c < next(g).length) {
          if (counts(g)(c) > 0) {
            val n = counts(g)(c).toDouble
            // exact integer sum, ONE division — the shared contract
            next(g)(c) = sums(g)(c).map(_ / n).toSeq
          }
          c += 1
        }
        g += 1
      }
      cents = next.map(_.toSeq).toSeq
      it += 1
    }
    cents
  }

  /** Train centroids: `iters` Lloyd rounds with the determinism
    * contract above ([[lloydIterate]] with a single group). Output:
    * (`cluster` int, `centroid` array&lt;double&gt; — QUANTIZED-unit
    * components, the exact values the assignment kernel consumes). */
  def trainCentroids(embs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 65536,
      s"trainCentroids: k must be in [1, 65536], got $k")
    val spark = embs.sparkSession
    import spark.implicits._
    val base = embs
      .filter(valid(col(embCol)))
      .select(col(idCol).as("_id"), quantized(col(embCol)).as("_x"))
    // seeds: the k smallest ids' vectors (bounded driver collect)
    val seedRows = base.orderBy(col("_id")).limit(k)
      .select(col("_x")).collect()
    require(seedRows.length == k,
      s"trainCentroids: corpus has ${seedRows.length} valid vectors, " +
        s"need >= $k")
    val cents: Seq[Seq[Double]] =
      seedRows.map(_.getSeq[Double](0).toSeq).toSeq
    val dim = cents.head.length
    require(cents.forall(_.length == dim),
      "trainCentroids: seed vectors must share one dimensionality")
    // rows of a different dimensionality than the seeds are dropped
    // (the validDim contract — they cannot score against the model)
    val baseD = base.filter(size(col("_x")) === dim)
      .select(lit(0).cast("int").as("_g"), col("_id"), col("_x"))
    val out = lloydIterate(baseD, Seq(cents), iters).head
    out.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cluster", "centroid")
  }

  /** Bounded validating collect of a (cluster, centroid) relation:
    * clusters must be exactly 0..k−1 and centroids one non-null
    * dimensionality — a corrupt or truncated artifact fails loudly. */
  private[graft] def collectCentroids(
      centroids: DataFrame): Seq[Seq[Double]] = {
    val rows = centroids
      .select(col("cluster").cast("int"), col("centroid")).take(65537)
    require(rows.length <= 65536,
      "collectCentroids: centroid table exceeds the 65536 cap")
    require(rows.nonEmpty, "collectCentroids: empty centroid table")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "collectCentroids: null cluster or centroid — the relation/" +
        "artifact is corrupt")
    val byCl = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
    require(byCl.map(_._1).sorted.toSeq == byCl.indices.toSeq,
      "collectCentroids: cluster ids must be exactly 0..k-1 — the " +
        "relation/artifact is corrupt")
    val dim = byCl.head._2.length
    require(dim >= 1 && byCl.forall(_._2.length == dim),
      "collectCentroids: centroids must share one dimensionality >= 1")
    byCl.sortBy(_._1).map(_._2)
  }

  /** Assignment under FROZEN centroids — one pure projection (usable
    * verbatim on a stream: [[graft.streaming.StreamKMeansAssign]]).
    * Output: (idCol, `cluster`, `d2`) as in [[lloyd]]. */
  def assign(embs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    val cl = typedlit(cents)
    embs
      .filter(validDim(col(embCol), cents.head.length))
      .select(col(idCol).as("_id"), quantized(col(embCol)).as("_x"))
      .withColumn("_d", distances(col("_x"), cl))
      .select(col("_id").as(idCol),
        (array_position(col("_d"), array_min(col("_d"))) - 1)
          .cast("int").as("cluster"),
        round(array_min(col("_d")) / lit(Scale2), 6).as("d2"))
  }

  /** Train + assign: `iters` Lloyd rounds, then one assignment pass
    * under the final centroids. Output: (idCol, `cluster` int,
    * `d2` = round(distance / 2^40, 6) — squared distance in input
    * units). Rows failing [[valid]] are dropped. */
  def lloyd(embs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    assign(embs, trainCentroids(embs, k, iters, idCol, embCol),
      idCol, embCol)

  // ---- centroid artifact (the tokenizer-seam discipline) ------------

  private val CentroidArtifactVersion = 1

  /** Persist trained centroids as a versioned on-disk model:
    * `<path>/centroids` parquet plus a one-row `<path>/meta`
    * (version, k completeness stamp). Validates before writing. */
  def saveCentroids(centroids: DataFrame, path: String): Unit = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val k = collectCentroids(centroids).size
    centroids.select(col("cluster").cast("int"), col("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Seq((CentroidArtifactVersion, k.toLong)).toDF("version", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[saveCentroids]] artifact, verifying version and stamp.
    * Load-path equality: [[assign]] from a loaded artifact equals
    * [[assign]] from the freshly-trained relation (KMeansSpec). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"loadCentroids: expected 1 meta row at $path/meta, " +
        s"got ${meta.length}")
    val m = meta(0)
    val version = m.getAs[Int]("version")
    require(version == CentroidArtifactVersion,
      s"loadCentroids: unsupported artifact version $version " +
        s"(this build reads $CentroidArtifactVersion)")
    val cents = spark.read.parquet(s"$path/centroids")
    val n = cents.count()
    require(n == m.getAs[Long]("k"),
      s"loadCentroids: table has $n rows, stamp says " +
        s"${m.getAs[Long]("k")} — incomplete or mixed artifact")
    cents
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
