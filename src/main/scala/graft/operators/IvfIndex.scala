package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PqExprs, VectorExprs}

/** The PERSISTED IVF index — inverted lists included.
  *
  * [[Similarity.ivfCentroids]]/[[Similarity.ivfTopKWithCentroids]]
  * persist only the coarse quantizer: that eliminates per-batch
  * RETRAINING, but every query batch still pays an O(|corpus|)
  * assignment projection to rebuild the cell column. This object is
  * the missing half — the layout every production IVF system (FAISS,
  * ScaNN, Milvus) actually ships: at build time the corpus is assigned
  * ONCE and written as a `(vec_id, v[, codes])` relation PARTITIONED
  * BY CELL, so a probe is a partition-pruned read of nProbe/nLists of
  * the data — delta-batch cost is ∝ probed cells, never ∝ corpus.
  *
  * On-disk layout under `path` (committed ATOMICALLY — built in a
  * sibling temp directory and renamed into place, so a torn build can
  * never be mistaken for an index):
  *
  *   - `meta/`      one row: (version, n_lists, dim, n_vecs, m, ksub,
  *                  n_epochs) — m = 0 marks a plain (non-PQ) index;
  *   - `quantizer/` a [[KMeans.saveCentroids]] artifact (quantized
  *                  units, version + k stamp) — ONE artifact format
  *                  for clustering models and coarse quantizers;
  *   - `cellstats/` (cell, n) — the inverted-list lengths, the
  *                  statistic adaptive mass-probing needs, carried by
  *                  the index for free instead of recomputed per batch
  *                  (the Σn == n_vecs stamp also validates the lists
  *                  without scanning them at load);
  *   - `lists/`     parquet `partitionBy("epoch", "cell")`: (vec_id,
  *                  v) plus, when m > 0, the PQ `codes`. The epoch
  *                  level makes [[append]] crash-safe: meta commits
  *                  the epoch COUNT last, so files of a torn append
  *                  sit in an epoch the readers never select;
  *   - `codebooks/` (m > 0 only) the [[Similarity.pqCodebooks]]
  *                  relation (j, c, pos, cval).
  *
  * Training is the shared deterministic contract
  * ([[Similarity.trainFrame]] smallest-id byte-budgeted sample,
  * [[KMeans.lloydIterateLocal]] — the ONE Lloyd trainer; for a PQ
  * index the coarse quantizer and all m codebooks advance in the same
  * grouped run, exactly [[Similarity.ivfPqTopK]]'s training), so the
  * index is a pure function of the corpus and the searches here are
  * provably row-for-row EQUAL to the recompute routes
  * ([[Similarity.ivfTopKWithCentroids]] / [[Similarity.ivfPqTopK]]
  * with the same geometry — the IvfIndexSpec load-path equality laws).
  *
  * Scale shape of a probe: centroids ride the plan as literals
  * (bounded nLists×dim collect); the probed CELL SET — ≤ nLists
  * values, from one tiny query-side job — becomes a LITERAL `IN`
  * filter on the partition column, so the scan's PartitionFilters
  * prune to the probed directories (asserted by IvfIndexSpec); the
  * candidate join is cell-equality against the broadcast probe set.
  * No full-corpus projection, no assignment scan, anywhere.
  */
object IvfIndex {

  // v2: epoch-partitioned lists + the n_epochs commit stamp ([[append]])
  private val IndexVersion = 2

  /** Build and atomically persist the index at `path` (overwrites any
    * complete index already there only if the final rename wins; a
    * concurrent winner's index is left intact). `m > 0` adds PQ codes
    * (dim must divide by m) and codebooks — the IVF+PQ layout. */
  def build(embeddings: DataFrame, path: String, nLists: Int = 16,
      m: Int = 0, ksub: Int = 16, trainSample: Int = 100000,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxTrainBytes: Long = 64L << 20): Unit = {
    require(nLists >= 1 && nLists <= 65536,
      s"IvfIndex.build: nLists must be in [1, 65536], got $nLists")
    require(m >= 0, s"IvfIndex.build: m must be >= 0, got $m")
    require(m == 0 || ksub >= 2,
      s"IvfIndex.build: need ksub >= 2 for a PQ index, got $ksub")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings
      .select(col(idCol).as("vec_id"), col(embCol).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))
    val (sample, dim) = Similarity.trainFrame(corpus, trainSample,
      maxTrainBytes, "IvfIndex.build")
    require(m == 0 || dim % m == 0,
      s"IvfIndex.build: dim $dim is not divisible by m=$m")
    val dsub = if (m > 0) dim / m else 0
    // coarse quantizer and (for PQ) all m codebooks in ONE grouped
    // Lloyd run — the ivfPqTopK training discipline
    val specs = (0, dim, nLists) +:
      (if (m > 0) Similarity.pqSpecs(m, ksub, dsub) else Seq.empty)
    val all = Similarity.trainCenters(sample, specs, "IvfIndex.build")
    val centers = all.head

    val cbOpt =
      if (m == 0) None
      else Some(Similarity.flattenCodebooks(all.tail, m, ksub, dsub))
    val assigned = assignRelation(corpus, centers, cbOpt, dim, m, ksub,
      dsub, epoch = 0, what = "IvfIndex.build")

    // build in a sibling temp dir, rename into place: the committed
    // path either holds a COMPLETE index or nothing — a crash between
    // the table writes can never leave a loadable-looking torn artifact
    val tmp = path + ".build-" + ProcessHandle.current().pid()
    sweepTornBuilds(path, keep = tmp)
    deleteRecursively(new java.io.File(tmp))
    try {
      // quantized-unit centroid relation, the KMeans artifact contract
      val centRel = centers.zipWithIndex.map { case (c, i) =>
        (i, c.map(_ * KMeans.Scale).toSeq)
      }.toSeq.toDF("cluster", "centroid")
      KMeans.saveCentroids(centRel, s"$tmp/quantizer")
      assigned.write.mode("overwrite").partitionBy("epoch", "cell")
        .parquet(s"$tmp/lists")
      // stats from the WRITTEN lists — a stamp of what is on disk, not
      // of what the plan intended (column-pruned: reads cell only)
      val nVecs = writeCellStats(spark, tmp)
      cbOpt.foreach { cb =>
        val rows = for {
          j <- 0 until m; c <- 0 until ksub; d <- 0 until dsub
        } yield (j, c, d, cb((j * ksub + c) * dsub + d))
        rows.toDF("j", "c", "pos", "cval")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/codebooks")
      }
      writeMeta(spark, tmp, nLists, dim, nVecs, m, ksub, nEpochs = 1)

      val target = new java.io.File(path)
      deleteRecursively(target)
      if (!new java.io.File(tmp).renameTo(target)) {
        // a concurrent builder won the rename race: keep the winner's
        // index (same deterministic build), drop ours
        require(new java.io.File(path, "meta").isDirectory,
          s"IvfIndex.build: rename to $path failed and no index exists")
      }
    } finally deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Newest mtime in the tree — an in-flight builder keeps touching
    * leaf files even when the root dir's own mtime stays put. */
  private def deepMtime(f: java.io.File): Long = {
    val own = f.lastModified()
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foldLeft(own)((m, c) => math.max(m, deepMtime(c)))
    else own
  }

  /** Sweep torn `.build-<pid>` tmp dirs left by CRASHED builders: the
    * normal path deletes its own tmp in the `finally`, but a killed
    * JVM's dir would otherwise survive forever next to the index. Run
    * at build entry; a sibling is deleted only when the pid embedded in
    * its name is no longer a live process (so a concurrent cross-JVM
    * builder's in-flight tmp is never touched; `keep` — the current
    * builder's own tmp name — is skipped regardless and recreated by
    * the caller).
    *
    * SCOPE: the pid liveness check is SAME-MACHINE, same pid
    * namespace. On a shared filesystem a live builder on another host
    * would look dead — so a recent-mtime age guard additionally skips
    * any dir modified in the last [[SweepMinAgeMs]] (an in-flight
    * build keeps writing; a torn one goes stale). The guard is a
    * HEURISTIC with a clock-skew assumption: it compares this host's
    * clock against mtimes stamped by the writer's filesystem, so it
    * holds only when |skew| + mtime-propagation lag stays well under
    * the age floor — a sweeper minutes AHEAD of a writer whose last
    * mtime landed at file close (one long write) could still sweep a
    * live cross-host build. Deployments with skewed clocks or lazy
    * mtime propagation should raise the floor via
    * `spark.graft.ivf.sweepMinAgeMs` (or the JVM system property of
    * the same name; the Spark conf wins), sized ≥ several × the
    * worst-case skew. A recycled pid can still keep a torn dir alive
    * indefinitely — acceptable garbage, never a correctness hazard
    * (tmp dirs are invisible to readers). */
  private[graft] def SweepMinAgeMs: Long = {
    val key = "spark.graft.ivf.sweepMinAgeMs"
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption(key))
      .orElse(sys.props.get(key))
    conf.flatMap(_.toLongOption).getOrElse(10L * 60L * 1000L)
  }

  private def sweepTornBuilds(path: String, keep: String): Unit = {
    val base = new java.io.File(path)
    val prefix = base.getName + ".build-"
    val parent = base.getAbsoluteFile.getParentFile
    val siblings = Option(parent).flatMap(p => Option(p.listFiles()))
      .getOrElse(Array.empty[java.io.File])
    siblings.foreach { f =>
      if (f.isDirectory && f.getName.startsWith(prefix) &&
          f.getName != new java.io.File(keep).getName) {
        val alive = f.getName.stripPrefix(prefix).toLongOption.exists {
          pid =>
            pid > 0 && {
              val h = ProcessHandle.of(pid)
              h.isPresent && h.get.isAlive
            }
        }
        // age guard: never touch a dir still being written (covers
        // builders this machine's pid namespace cannot see)
        val recentlyTouched =
          System.currentTimeMillis() - deepMtime(f) < SweepMinAgeMs
        if (!alive && !recentlyTouched) deleteRecursively(f)
      }
    }
  }

  /** The shared assignment/encode projection of [[build]] and
    * [[append]]: (vec_id, v[, codes], epoch, cell), one codegen pass. */
  private def assignRelation(corpus: DataFrame,
      centers: Array[Array[Double]], cbOpt: Option[Array[Double]],
      dim: Int, m: Int, ksub: Int, dsub: Int, epoch: Int,
      what: String): DataFrame = {
    val cellCol = element_at(
      Similarity.cellsRankedExpr(col("v"), centers), 1)("cell")
    cbOpt match {
      case None =>
        corpus.select(col("vec_id"), col("v"),
          lit(epoch).as("epoch"), cellCol.as("cell"))
      case Some(cb) =>
        corpus.select(col("vec_id"), col("v"),
          PqExprs.encode(
            Similarity.dimGuarded(col("v").cast("array<double>"), dim,
              what), cb, m, ksub, dsub).as("codes"),
          lit(epoch).as("epoch"), cellCol.as("cell"))
    }
  }

  /** Recompute `cellstats` from the WRITTEN lists (all epochs present
    * on disk — callers stamp the committed epoch count in meta
    * afterwards) and return the total row count. */
  private def writeCellStats(spark: SparkSession, path: String): Long = {
    val stats = spark.read.parquet(s"$path/lists")
      .groupBy(col("cell").cast("int").as("cell"))
      .agg(count(lit(1)).as("n"))
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/cellstats_next")
    // overwrite-in-place via the staged copy: the stats job READS the
    // old cellstats' sibling lists only, so this is safe; the staged
    // dir then replaces cellstats atomically (local-fs rename)
    val next = new java.io.File(s"$path/cellstats_next")
    val cur = new java.io.File(s"$path/cellstats")
    deleteRecursively(cur)
    require(next.renameTo(cur),
      s"IvfIndex: could not move cellstats into place at $path")
    spark.read.parquet(s"$path/cellstats")
      .agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
  }

  /** Meta is the index's COMMIT POINT, so it is replaced via a staged
    * copy + rename (the cellstats discipline) — a plain overwrite
    * deletes the old dir before writing the new one, and a crash in
    * that window would leave the whole index unreadable. `lastTag`
    * rides the same commit: [[append]] stamps its caller-supplied tag
    * atomically with the epoch bump, which is what makes a replayed
    * streaming batch detectable (see [[append]]). The residual window
    * is the delete+rename pair itself (microseconds, no job inside —
    * the cellstats discipline), not the meta-building Spark job. */
  private def writeMeta(spark: SparkSession, path: String, nLists: Int,
      dim: Int, nVecs: Long, m: Int, ksub: Int, nEpochs: Int,
      lastTag: Option[String] = None): Unit = {
    import spark.implicits._
    Seq((IndexVersion, nLists, dim, nVecs, m, ksub, nEpochs,
        lastTag.orNull))
      .toDF("version", "n_lists", "dim", "n_vecs", "m", "ksub",
        "n_epochs", "last_tag")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_next")
    val next = new java.io.File(s"$path/meta_next")
    val cur = new java.io.File(s"$path/meta")
    deleteRecursively(cur)
    require(next.renameTo(cur),
      s"IvfIndex: could not move meta into place at $path")
  }

  private case class Meta(nLists: Int, dim: Int, nVecs: Long, m: Int,
      ksub: Int, nEpochs: Int, lastTag: Option[String])

  private def loadMeta(spark: SparkSession, path: String): Meta = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.length == 1,
      s"IvfIndex: expected 1 meta row at $path/meta, got ${rows.length}")
    val r = rows(0)
    val version = r.getAs[Int]("version")
    require(version == IndexVersion,
      s"IvfIndex: unsupported index version $version (this build " +
        s"reads $IndexVersion)")
    // pre-round-16 metas carry no last_tag column
    val tag =
      if (r.schema.fieldNames.contains("last_tag"))
        Option(r.getAs[String]("last_tag"))
      else None
    Meta(r.getAs[Int]("n_lists"), r.getAs[Int]("dim"),
      r.getAs[Long]("n_vecs"), r.getAs[Int]("m"), r.getAs[Int]("ksub"),
      r.getAs[Int]("n_epochs"), tag)
  }

  /** Append a delta batch under the FROZEN quantizer — incremental
    * index maintenance, the other half of the delta story next to the
    * pruned probe: new vectors are assigned (and, on a PQ index,
    * encoded) with the artifact's own centroids/codebooks — so
    * assignments stay consistent with every previous batch by
    * construction — and land in a NEW epoch under their cell
    * partitions. Commit order makes the append crash-safe: list files
    * first, then the cellstats restamp, then meta with the bumped
    * epoch count LAST — a crash before the meta write leaves the new
    * epoch's files invisible to every reader (epoch ≥ n_epochs is
    * never selected), and a crash between cellstats and meta is a
    * stamp mismatch that fails loudly at load (and self-heals through
    * [[graft.Artifacts.cached]]).
    *
    * Equality law (IvfIndexSpec): searching an appended index ≡
    * [[Similarity.ivfTopKWithCentroids]] over (corpus ∪ delta) under
    * the same frozen quantizer, row for row.
    *
    * Scale shape: one assignment/encode projection over the DELTA
    * only plus a cell-keyed write — cost ∝ |delta|; the restamp is a
    * column-pruned cell read. No training, no corpus pass.
    *
    * @param tag optional idempotence handle: a tag equal to the
    *   index's last committed one makes the call a no-op. Streaming
    *   callers ([[graft.streaming.StreamAnnIngest]]) pass their batch
    *   id so a checkpoint replay never appends twice; the tag commits
    *   atomically with the epoch bump. */
  def append(spark: SparkSession, path: String, embeddings: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding",
      tag: Option[String] = None): Unit = {
    val meta = loadMeta(spark, path)
    // idempotence handle for replayed appends (streaming foreachBatch):
    // the tag commits atomically with the epoch bump in the meta
    // write, so "this tag is already the last applied" means the
    // append fully committed — a retried batch is a no-op. Batches
    // apply in order, so checking only the LAST tag suffices.
    if (tag.isDefined && meta.lastTag == tag) return
    val centers = loadCenters(spark, path, meta)
    val cbOpt =
      if (meta.m == 0) None
      else {
        val (cb, m, ksub, dsub) = Similarity.collectCodebooks(
          spark.read.parquet(s"$path/codebooks"), "IvfIndex.append")
        require(m == meta.m && ksub == meta.ksub && m * dsub == meta.dim,
          s"IvfIndex.append: codebooks are m=$m ksub=$ksub dsub=$dsub, " +
            s"meta says m=${meta.m} ksub=${meta.ksub} dim=${meta.dim}")
        Some(cb)
      }
    // sweep uncommitted epochs from a previously crashed append: their
    // files share the epoch number this append is about to write and
    // would otherwise be adopted (possibly duplicating the delta)
    val listsDir = new java.io.File(s"$path/lists")
    if (listsDir.isDirectory)
      listsDir.listFiles()
        .filter(f => f.getName.startsWith("epoch=") &&
          f.getName.drop("epoch=".length).toIntOption
            .exists(_ >= meta.nEpochs))
        .foreach(deleteRecursively)
    val corpus = embeddings
      .select(col(idCol).as("vec_id"), col(embCol).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))
    val dsub = if (meta.m > 0) meta.dim / meta.m else 0
    assignRelation(corpus, centers, cbOpt, meta.dim, meta.m, meta.ksub,
      dsub, epoch = meta.nEpochs, what = "IvfIndex.append")
      .write.mode("append").partitionBy("epoch", "cell")
      .parquet(s"$path/lists")
    val nVecs = writeCellStats(spark, path)
    writeMeta(spark, path, meta.nLists, meta.dim, nVecs, meta.m,
      meta.ksub, meta.nEpochs + 1, lastTag = tag)
  }

  /** Dequantized centroid matrix from the quantizer artifact —
    * validated ([[KMeans.collectCentroids]]) and checked against the
    * meta geometry. */
  private def loadCenters(spark: SparkSession, path: String,
      meta: Meta): Array[Array[Double]] = {
    val centers = KMeans.collectCentroids(
        KMeans.loadCentroids(spark, s"$path/quantizer"))
      .map(_.map(_ / KMeans.Scale).toArray).toArray
    require(centers.length == meta.nLists &&
        centers.head.length == meta.dim,
      s"IvfIndex: quantizer is ${centers.length}×${centers.head.length}, " +
        s"meta says ${meta.nLists}×${meta.dim} — mixed artifact")
    centers
  }

  /** Bounded validated cell masses (inverted-list lengths): dense over
    * observed cells, Σn must equal the meta row-count stamp — the
    * lists are validated WITHOUT scanning them. */
  private def loadCellMasses(spark: SparkSession, path: String,
      meta: Meta): Array[Long] = {
    val rows = spark.read.parquet(s"$path/cellstats")
      .select(col("cell").cast("int"), col("n").cast("long"))
      .take(meta.nLists + 1)
    require(rows.length <= meta.nLists,
      s"IvfIndex: cellstats has more rows than n_lists=${meta.nLists}")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "IvfIndex: null cellstats row — the artifact is corrupt")
    val mass = new Array[Long](meta.nLists)
    rows.foreach { r =>
      val c = r.getInt(0)
      require(c >= 0 && c < meta.nLists,
        s"IvfIndex: cellstats cell $c outside [0, ${meta.nLists})")
      mass(c) = r.getLong(1)
    }
    require(mass.sum == meta.nVecs,
      s"IvfIndex: cellstats total ${mass.sum} != n_vecs stamp " +
        s"${meta.nVecs} — incomplete or mixed artifact")
    mass
  }

  /** The pruned candidate read: the probed cell set (≤ nLists values,
    * one bounded query-side job) becomes a LITERAL IN-filter on the
    * partition column, so the parquet scan reads only the probed cell
    * directories (PartitionFilters — the whole point of the index).
    * Only COMMITTED epochs are selected (`epoch < n_epochs` — also a
    * partition filter), so files of a torn [[append]] are invisible. */
  private def prunedLists(spark: SparkSession, path: String, meta: Meta,
      probes: DataFrame): DataFrame = {
    val cells = probes.select(col("cell").cast("int")).distinct()
      .collect().map(_.getInt(0))
    spark.read.parquet(s"$path/lists")
      .filter(col("epoch") < meta.nEpochs &&
        col("cell").isin(cells.map(Int.box): _*))
  }

  /** Exact-cosine top-k through the persisted lists — the
    * [[Similarity.ivfTopKWithCentroids]] semantics at ∝-probed-cells
    * cost. Row-for-row EQUAL to that route on the same corpus and
    * geometry (IvfIndexSpec law). */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nProbe: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val meta = loadMeta(spark, path)
    require(nProbe >= 1 && nProbe <= meta.nLists,
      s"IvfIndex.searchTopK: need 1 <= nProbe <= ${meta.nLists}, " +
        s"got $nProbe")
    // overlap the two independent bounded loads (§2.6; see searchPqTopK)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fMasses = Future(loadCellMasses(spark, path, meta)) // stamp check
    val centers = loadCenters(spark, path, meta)
    Await.result(fMasses, Duration.Inf): Unit
    val probes = queries
      .select(col(idCol).as("query_id"), col(embCol).as("qv"))
      .filter(col("qv").isNotNull && !exists(col("qv"), _.isNull))
      .select(col("query_id"), col("qv"),
        explode(slice(Similarity.cellsRankedExpr(col("qv"), centers),
          1, nProbe)("cell")).as("cell"))
    val scored = prunedLists(spark, path, meta, probes).as("c")
      .join(broadcast(probes).as("q"),
        col("c.cell") === col("q.cell") &&
          col("c.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"),
        col("c.vec_id").as("vec_id"),
        round(Similarity.cosine(col("q.qv"), col("c.v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** ADC top-k (+ optional IVFADC exact re-rank and adaptive mass
    * probing) through a PQ index (`m > 0` at build) — the
    * [[Similarity.ivfPqTopK]] semantics with every per-batch corpus
    * pass replaced by index reads: candidates come from the pruned
    * cell partitions' CODE columns, cell masses from `cellstats`
    * (never a per-batch corpus aggregate), and the re-rank fetches
    * raw vectors from the same pruned partitions (the shortlist lives
    * inside probed cells by construction). Row-for-row EQUAL to
    * [[Similarity.ivfPqTopK]] at the same geometry (IvfIndexSpec). */
  def searchPqTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10, nProbe: Int = 4, rerank: Int = 0,
      probeMass: Double = 0.0, nProbeMax: Int = 0,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val meta = loadMeta(spark, path)
    require(meta.m > 0,
      "IvfIndex.searchPqTopK: the index carries no PQ codes " +
        "(built with m = 0) — use searchTopK")
    require(nProbe >= 1 && nProbe <= meta.nLists,
      s"IvfIndex.searchPqTopK: need 1 <= nProbe <= ${meta.nLists}, " +
        s"got $nProbe")
    require(rerank == 0 || rerank >= k,
      s"IvfIndex.searchPqTopK: rerank must be 0 (off) or >= k, " +
        s"got $rerank vs k=$k")
    require(probeMass >= 0.0 && probeMass <= 1.0,
      s"IvfIndex.searchPqTopK: probeMass must be in [0,1], got $probeMass")
    val pMax = if (nProbeMax <= 0) meta.nLists else nProbeMax
    require(pMax >= nProbe && pMax <= meta.nLists,
      s"IvfIndex.searchPqTopK: need nProbe <= nProbeMax <= " +
        s"${meta.nLists}, got $nProbe/$pMax/${meta.nLists}")
    // the three bounded artifact loads (quantizer, codebooks, cell
    // masses) are independent once meta is read — overlap them from a
    // small driver pool (guide §2.6 "2-3 jobs in flight") instead of
    // paying three sequential job round-trips; each is a bounded
    // validated collect, read-only, so ordering is immaterial
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fCenters = Future(loadCenters(spark, path, meta))
    val fCodebooks = Future(Similarity.collectCodebooks(
      spark.read.parquet(s"$path/codebooks"), "IvfIndex.searchPqTopK"))
    val fMasses = Future(loadCellMasses(spark, path, meta))
    val centers = Await.result(fCenters, Duration.Inf)
    val (cb, m, ksub, dsub) = Await.result(fCodebooks, Duration.Inf)
    require(m == meta.m && ksub == meta.ksub && m * dsub == meta.dim,
      s"IvfIndex.searchPqTopK: codebooks are m=$m ksub=$ksub " +
        s"dsub=$dsub, meta says m=${meta.m} ksub=${meta.ksub} " +
        s"dim=${meta.dim} — mixed artifact")
    val sqn = Similarity.pqSqNorms(cb, m, ksub, dsub)
    val dim = meta.dim
    val massByCell = Await.result(fMasses, Duration.Inf)

    val probeCol =
      if (probeMass <= 0.0)
        slice(Similarity.cellsRankedExpr(col("q"), centers), 1,
          nProbe)("cell")
      else {
        // the adaptive-mass walk over the PERSISTED list lengths —
        // identical arithmetic to ivfPqTopK's, with the per-batch
        // corpus aggregate replaced by the index's own statistic
        val target = math.ceil(probeMass * massByCell.sum).toLong
        val massLit = typedlit(massByCell.toSeq)
        val rankedCells = slice(
          Similarity.cellsRankedExpr(col("q"), centers), 1, pMax)("cell")
        val masses = transform(rankedCells,
          c => coalesce(get(massLit, c), lit(0L)))
        val idxs = sequence(lit(0), size(masses) - 1)
        val cums = transform(idxs, i =>
          aggregate(slice(masses, lit(1), i + 1), lit(0L), (a, x) => a + x))
        val needed = coalesce(
          element_at(filter(idxs, i => get(cums, i) >= lit(target)), 1) + 1,
          size(cums))
        slice(rankedCells, lit(1), greatest(needed, lit(nProbe)))
      }
    val qs = queries
      .select(col(idCol).as("query_id"),
        col(embCol).cast("array<double>").as("q"))
      .filter(col("q").isNotNull && !exists(col("q"), _.isNull) &&
        size(col("q")) === dim)
      .select(col("query_id"),
        explode(probeCol).as("cell"),
        PqExprs.table(col("q"), cb, m, ksub, dsub).as("qt"),
        sqrt(VectorExprs.dot(col("q"), col("q"))).as("qnorm"))
    val cand = prunedLists(spark, path, meta, qs)
    val scored = cand.as("c").join(broadcast(qs).as("p"),
        col("c.cell") === col("p.cell") &&
          col("c.vec_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"),
        col("c.vec_id").as("vec_id"),
        PqExprs.cosine(col("c.codes"), col("p.qt"), col("p.qnorm"), sqn,
          m, ksub).as("pq_cosine"))
      .filter(col("pq_cosine").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_cosine").desc, col("vec_id"))
    if (rerank <= 0)
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    else {
      val short = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= rerank)
        .select(col("query_id"), col("vec_id"))
      val qv = queries
        .select(col(idCol).as("query_id"),
          col(embCol).cast("array<double>").as("_q"))
        .filter(col("_q").isNotNull && !exists(col("_q"), _.isNull) &&
          size(col("_q")) === dim)
      // the shortlist's raw vectors come from the SAME pruned cell
      // partitions (every shortlist row was a candidate, and every
      // candidate lives in a probed cell) — the corpus table is never
      // touched; cosine over the double-cast vector matches ivfPqTopK
      // (float→double widening is exact)
      val exact = prunedLists(spark, path, meta, qs)
        .select(col("vec_id"), col("v").cast("array<double>").as("v"))
        .join(broadcast(short), Seq("vec_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(Similarity.cosine(col("v"), col("_q")), 6).as("cosine"))
        .filter(col("cosine").isNotNull)
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      exact.withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
    }
  }
}
