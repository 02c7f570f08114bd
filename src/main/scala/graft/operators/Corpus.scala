package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ShingleExprs

/** Corpus-preparation operators a training-data pipeline runs between
  * raw ingestion and tokenization: deterministic split assignment,
  * hash-based sampling, and document chunking.
  *
  * Everything here is a pure projection / generator over columns — no
  * shuffle, no RNG state, no driver participation — so each operator is
  * a single embarrassingly-parallel pass at any corpus size, and every
  * output is deterministic given the input (re-running a pipeline
  * yields byte-identical splits and chunks, which is what makes
  * experiment lineage reproducible).
  */
object Corpus {

  /** Deterministic position of a key in [0, 1): an oracle-replayable
    * polynomial fold of the key's string form, pushed through two LCG
    * mixing rounds (the raw fold of a SHORT key never wraps the modulus
    * — e.g. 4-digit ids all fold below 0.13·P — so without mixing the
    * distribution is badly skewed; one multiply by a large constant mod
    * P wraps for every nonzero value, and two rounds measure uniform to
    * ±3% per decile on integer ids), scaled by the modulus. Stable
    * across runs, partitionings, and engines — the property that makes
    * hash-splits sound: a document's split never depends on what else
    * is in the corpus (unlike `randomSplit`, whose assignment shifts
    * with partitioning), so train/test membership survives corpus
    * growth and incremental reprocessing. */
  def hashUnit(key: Column): Column = {
    val P = 1000000007L
    val h0 = ShingleExprs.polyFingerprint(key.cast("string"))
    val h1 = pmod(h0 * lit(1103515245L) + lit(12345L), lit(P))
    val h2 = pmod(h1 * lit(69069L) + lit(1L), lit(P))
    h2 / lit(1000000007.0)
  }

  /** Keep each row with probability `fraction`, decided by [[hashUnit]]
    * of its key — a deterministic, join-stable sample (two tables
    * sampled on the same key keep the same rows, so sampled relations
    * still join). */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sampleByHash: fraction must be in [0,1], got $fraction")
    df.filter(hashUnit(key) < fraction)
  }

  /** Assign each row a named split by cumulative [[hashUnit]] ranges:
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` sends u <
    * 0.8 to train, u < 0.9 to val, the rest to test (the last split
    * absorbs any rounding slack). Fractions must sum to ~1. */
  def assignSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "assignSplit: no splits given")
    require(splits.forall(_._2 >= 0.0),
      s"assignSplit: negative fraction in $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"assignSplit: fractions must sum to 1, got $total")
    val u = hashUnit(key)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        Some(acc match {
          case None => when(u < cum, name)
          case Some(c) => c.when(u < cum, name)
        })
      } match {
        case Some(c) => c.otherwise(splits.last._1)
        case None => lit(splits.last._1) // single split
      }
    // a null key has no hash position — surface null, don't silently
    // fold it into the last split (every `u < cum` is null ⇒ otherwise)
    when(key.isNotNull, assigned)
  }

  /** Deterministic weighted corpus mixing: keep each row with its
    * source's sampling rate, decided by [[hashUnit]] of the row key —
    * the "data mixture" primitive (e.g. books at 2×-epoch-equivalent
    * down-weighting, web at 0.1) as a reproducible projection. Sources
    * absent from `rates` keep `defaultRate`. Like [[sampleByHash]],
    * membership is stable across runs, partitionings, and corpus
    * growth, so a mixture is re-derivable instead of a one-off artifact.
    * Rows with a null key have no hash position and are EXCLUDED from
    * every mixture (explicitly — not as a comparison-with-null
    * artifact), including sources at rate 1.0; filter them upstream if
    * they must be kept. */
  def mixBySource(df: DataFrame, key: Column, sourceCol: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"mixBySource: rates must be in [0,1], got $rates / $defaultRate")
    val rate = rates.foldLeft(Option.empty[Column]) {
      case (acc, (src, r)) => Some(acc match {
        case None => when(sourceCol === src, r)
        case Some(c) => c.when(sourceCol === src, r)
      })
    } match {
      case Some(c) => c.otherwise(defaultRate)
      case None => lit(defaultRate)
    }
    df.filter(key.isNotNull && hashUnit(key) < rate)
  }

  /** Keep at most `k` rows per group, chosen in deterministic
    * ([[hashUnit]](key), key) order — balanced per-group sampling
    * ("at most 10k documents per source") where WHICH rows survive is
    * a pure function of their keys: stable across runs, partitionings,
    * and corpus growth (a group's survivors only change when lower-
    * hashed rows arrive, never by reshuffling). One keyed exchange
    * (rank window); rows with a null key have no hash position and are
    * excluded, as in [[mixBySource]]. */
  def capPerGroup(df: DataFrame, groupCol: Column, key: Column,
      k: Int): DataFrame = {
    require(k > 0, s"capPerGroup: k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    df.filter(key.isNotNull)
      .withColumn("_u", hashUnit(key))
      .withColumn("_rn", row_number()
        .over(Window.partitionBy(groupCol).orderBy(col("_u"), key)))
      .filter(col("_rn") <= k)
      .drop("_u", "_rn")
  }

  /** Keep each group's prefix — in ([[hashUnit]](key), key) order —
    * while the running token total stays within `budget`: the
    * token-budget analog of [[capPerGroup]] ("500M tokens per
    * source"). Prefix-truncation, not bin packing: once the cumulative
    * count passes the budget every later row of the group drops, so
    * membership stays a pure prefix property (stable under corpus
    * growth the same way hash splits are). A single row larger than
    * the whole budget is dropped with everything after it. One keyed
    * exchange (cumsum window); null keys are excluded, null token
    * counts weigh 0. */
  def capTokensPerGroup(df: DataFrame, groupCol: Column, key: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"capTokensPerGroup: budget must be > 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    df.filter(key.isNotNull)
      .withColumn("_toks", coalesce(tokens.cast("long"), lit(0L)))
      .withColumn("_cum", sum(col("_toks"))
        .over(Window.partitionBy(groupCol).orderBy(hashUnit(key), key)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cum") <= budget)
      .drop("_toks", "_cum")
  }

  /** Exact linear-interpolated percentiles per group, as a DISTRIBUTED
    * plan: rank values with a per-group sort window, pick the two
    * bracketing ranks per percentile (pos = p·(n−1), 0-based), and
    * interpolate `lo + frac·(hi − lo)` — the same definition as
    * numpy/DuckDB `quantile_cont`, so the result is oracle-checkable.
    * Unlike `percentile()` (which buffers every group value in the
    * aggregation state), nothing here holds a group in memory: the sort
    * is Spark's spilling external sort, so the plan survives groups of
    * any size — a group still sorts within one task, the usual keyed-
    * window bound. For corpus-scale dashboards where ±ε is acceptable,
    * [[approxPercentiles]] trades exactness for a bounded sketch. */
  def exactPercentiles(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"exactPercentiles: percentiles must be in [0,1], got $ps")
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(groupCol).as("g"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    // the group count piggybacks on the rank window's exchange (same
    // partitioning, unordered frame) — no separate aggregate, no join
    val joined = v
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("g"))))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("n") - 1)
      val lo = floor(pos) + 1 // 1-based ranks
      val hi = ceil(pos) + 1
      Seq(
        max(when(col("rn") === lo, col("v"))).as(s"_lo_$name"),
        max(when(col("rn") === hi, col("v"))).as(s"_hi_$name"),
        max(pos - floor(pos)).as(s"_frac_$name"))
    }
    val out = ps.map { case (name, _) =>
      round(col(s"_lo_$name") +
        col(s"_frac_$name") * (col(s"_hi_$name") - col(s"_lo_$name")), 6)
        .as(name)
    }
    joined.groupBy(col("g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: out: _*)
  }

  /** Sketch-based percentiles for corpus-scale stats: bounded state per
    * group (`approx_percentile`), accuracy controlled by the standard
    * accuracy knob. The scale default where ±ε is acceptable. */
  def approxPercentiles(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    val exprs = ps.map { case (name, p) =>
      percentile_approx(value.cast("double"), lit(p), lit(accuracy)).as(name)
    }
    df.groupBy(col(groupCol)).agg(exprs.head, exprs.tail: _*)
  }

  /** Fixed-width character chunks with overlap — the pre-embedding
    * chunker. Chunk i covers code points [1 + i·step, 1 + i·step +
    * chunkChars) with step = chunkChars − overlapChars; starts walk the
    * text while they remain within it, so every code point lands in at
    * least one chunk and the final chunk may run short. One generator
    * projection: no shuffle, rows ∝ output chunks. Output columns:
    * `idCol`, `chunk_idx` (0-based), `chunk`, `n_chars`. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, overlapChars: Int = 0): DataFrame = {
    require(chunkChars > 0, s"chunk: chunkChars must be > 0, got $chunkChars")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"chunk: overlapChars must be in [0, chunkChars), got $overlapChars")
    val step = chunkChars - overlapChars
    val t = col(textCol)
    df.filter(t.isNotNull && length(t) >= 1)
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0L), floor((length(t) - 1) / lit(step))),
          i => t.substr((i * step + 1).cast("int"), lit(chunkChars)))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col").as("chunk"))
      .withColumn("n_chars", length(col("chunk")).cast("long"))
  }
}
