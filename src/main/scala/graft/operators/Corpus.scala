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

  /** Fractional-epoch per-source upsampling — the other half of data
    * mixing that sampling cannot express: "2.5 epochs of books, 0.4
    * epochs of web". Every row of source `s` with `epochs(s) = e` emits
    * `floor(e)` copies, plus one more for the [[hashUnit]]-chosen
    * `e − floor(e)` fraction of keys, tagged `epoch_idx` (0-based). The
    * hash input is salted (`key || "#ep"`) so the fractional-epoch pick
    * is independent of any [[mixBySource]]/[[assignSplit]] decision on
    * the same key; like those, WHICH keys get the extra copy is a pure
    * key function — stable across runs, partitionings, and corpus
    * growth. `e < 1` degenerates to plain sampling; `e = 0` drops the
    * source. Null keys have no hash position and are excluded.
    *
    * Scale shape: one generator projection (rows ∝ output, ≤ ⌈e⌉ per
    * input row) — no shuffle, no driver participation; the epochs map
    * rides the plan as a literal when-chain. */
  def upsampleBySource(df: DataFrame, key: Column, sourceCol: Column,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0),
      s"upsampleBySource: epochs must be >= 0, got $epochs / $defaultEpochs")
    val ep = epochs.foldLeft(Option.empty[Column]) {
      case (acc, (src, e)) => Some(acc match {
        case None => when(sourceCol === src, e)
        case Some(c) => c.when(sourceCol === src, e)
      })
    } match {
      case Some(c) => c.otherwise(defaultEpochs)
      case None => lit(defaultEpochs)
    }
    val u = hashUnit(concat(key.cast("string"), lit("#ep")))
    val n = floor(ep).cast("long") +
      when(u < ep - floor(ep), 1L).otherwise(0L)
    val cols = df.columns.map(col)
    df.filter(key.isNotNull)
      .withColumn("_n", n)
      .filter(col("_n") > 0)
      .select(cols :+
        explode(sequence(lit(0L), col("_n") - 1)).as("epoch_idx"): _*)
  }

  /** Temperature-scaled source mixing (the multilingual-training
    * recipe): source `s` with `N_s` rows is kept at rate
    * `min(1, targetFraction · N_total · N_s^(α−1) / Σ_t N_t^α)` — i.e.
    * sampling probability ∝ `N_s^α`, so `α = 1` reproduces uniform
    * sampling at `targetFraction` and `α < 1` up-weights small sources
    * (the τ-temperature mixture of mT5/XLM-R). WHICH rows survive is
    * [[hashUnit]]-deterministic, so the mixture is re-derivable and
    * join-stable like [[mixBySource]] (which this composes).
    *
    * Scale shape: one tiny per-source count aggregate (map-side
    * combined; rows = source cardinality) is collected to the driver —
    * bounded by the number of sources, the same sanctioned-collect
    * contract as IVF centroid training — and the rates ride back into
    * the plan as a literal when-chain; the corpus itself sees a single
    * filter projection, no shuffle. The Σ is folded in sorted-source
    * order so the double sum is deterministic and oracle-replayable. */
  def temperatureMix(df: DataFrame, key: Column, sourceCol: Column,
      alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha must be in (0,1], got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"temperatureMix: targetFraction must be in (0,1], got $targetFraction")
    val counts = df.filter(key.isNotNull && sourceCol.isNotNull)
      .groupBy(sourceCol.cast("string").as("_src")).count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val denom = counts.foldLeft(0.0) { case (a, (_, n)) =>
      a + math.pow(n.toDouble, alpha)
    }
    val total = counts.map(_._2).sum
    val rates = counts.map { case (s, n) =>
      // evaluation order matters for bit-exact oracle replay: keep this
      // left-to-right chain in sync with the SQL in SparkEntry.oracleSql
      s -> math.min(1.0,
        targetFraction * total * math.pow(n.toDouble, alpha) / denom / n)
    }.toMap
    mixBySource(df, key, sourceCol, rates, defaultRate = 0.0)
  }

  /** Deterministic global "shuffle" for training order: sort the corpus
    * by ([[hashUnit]](key), key) — a pseudo-random but fully
    * reproducible permutation (same key set ⇒ byte-identical order,
    * regardless of partitioning or cluster size), which is what a
    * training run needs where `ORDER BY rand()` is neither stable nor
    * resumable. The emitted `shuffle_key` column IS the order: writers
    * preserve it per file and the range boundaries make files
    * lexicographically ordered, so a reader consuming files in name
    * order replays the permutation.
    *
    * Plan: one range exchange (sampled boundaries) + per-partition
    * spilling sort — the standard distributed total sort; no window, no
    * single-task order assignment. Null keys have no position and are
    * excluded (the [[mixBySource]] convention). */
  def shuffleDeterministic(df: DataFrame, key: Column): DataFrame =
    df.filter(key.isNotNull)
      .withColumn("shuffle_key", hashUnit(key))
      .orderBy(col("shuffle_key"), key)

  /** Deterministic WEIGHTED training order — [[shuffleDeterministic]]
    * with per-source priorities: each row gets the Efraimidis–Spirakis
    * key `u^(1/w_source)` (u = [[hashUnit]]) and the corpus sorts on it
    * DESCENDING, so a source at weight w surfaces ∝ w-proportionally
    * often in any prefix of the order — "books early and often, web
    * late and thin" as one reproducible sort, the data-loader analog of
    * weighted sampling without replacement. Like the unweighted
    * shuffle, the order is a pure function of (key set, weights):
    * stable across runs, partitionings, and cluster sizes. The key is
    * rounded to 9 dp for engine portability (`pow` may differ in the
    * last ulp across libm implementations); order among the rare
    * resulting ties falls back to the row key. Weights must be > 0
    * (drop rows upstream with [[mixBySource]] rate 0 instead of
    * weight 0). Null keys/sources have no position and are excluded.
    *
    * Scale shape: one projection + the same single range exchange and
    * spilling per-partition sort as [[shuffleDeterministic]]. */
  def weightedOrder(df: DataFrame, key: Column, sourceCol: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0)
      : DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ > 0),
      s"weightedOrder: weights must be > 0, got $weights / $defaultWeight")
    val w = weights.foldLeft(Option.empty[Column]) {
      case (acc, (src, x)) => Some(acc match {
        case None => when(sourceCol === src, x)
        case Some(c) => c.when(sourceCol === src, x)
      })
    } match {
      case Some(c) => c.otherwise(defaultWeight)
      case None => lit(defaultWeight)
    }
    df.filter(key.isNotNull && sourceCol.isNotNull)
      .withColumn("order_key", round(pow(hashUnit(key), lit(1.0) / w), 9))
      .orderBy(col("order_key").desc, key)
  }

  /** Proportionally-allocated stratified sample to an (approximate)
    * TARGET COUNT: source `s` with `N_s` rows contributes its
    * `round(target · N_s / N)` lowest-[[hashUnit]] rows — "a 100k-doc
    * eval slice mirroring the corpus mix" with exact per-source counts
    * (± rounding), where rate-based sampling ([[sampleByHash]],
    * [[temperatureMix]]) only hits the target in expectation. WHICH
    * rows survive is deterministic, but unlike the rate-based samplers
    * membership is rank-relative: adding corpus rows can displace
    * previously-sampled ones (counts, not membership, are the
    * contract here — use the rate-based samplers when membership
    * stability matters).
    *
    * Scale shape: one tiny per-source count aggregate collected (the
    * [[temperatureMix]] sanctioned-collect contract), allocations ride
    * back as a literal when-chain. Selection ranks per source — with
    * `numRanges > 0` (recommended: source is a few-large-groups
    * column) via [[GroupedRank.rankInGroup]]'s parallel sorts, else a
    * keyed rank window (one task per source). Null keys/sources are
    * excluded. */
  def stratifiedSample(df: DataFrame, key: Column, sourceCol: Column,
      totalTarget: Long, numRanges: Int = 0): DataFrame = {
    require(totalTarget > 0,
      s"stratifiedSample: totalTarget must be > 0, got $totalTarget")
    val counts = df.filter(key.isNotNull && sourceCol.isNotNull)
      .groupBy(sourceCol.cast("string").as("_src")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    // keep this arithmetic in exact sync with the oracle SQL: the
    // left-to-right double chain and half-away-from-zero rounding agree
    // between Math.round and the oracle engine for positive values
    val ks = counts.map { case (s, n) =>
      s -> math.round(totalTarget.toDouble * n / total)
    }
    val kCol = ks.foldLeft(Option.empty[Column]) {
      case (acc, (src, kv)) => Some(acc match {
        case None => when(sourceCol === src, kv)
        case Some(c) => c.when(sourceCol === src, kv)
      })
    } match {
      case Some(c) => c.otherwise(0L)
      case None => lit(0L)
    }
    import org.apache.spark.sql.expressions.Window
    val scored = df.filter(key.isNotNull && sourceCol.isNotNull)
      .withColumn("_u", hashUnit(key))
    val ranked =
      if (numRanges > 0)
        GroupedRank.rankInGroup(scored, sourceCol,
          Seq(col("_u"), key), "_rn", numRanges)
      else scored.withColumn("_rn", row_number()
        .over(Window.partitionBy(sourceCol).orderBy(col("_u"), key))
        .cast("long"))
    ranked.filter(col("_rn") <= kCol).drop("_u", "_rn")
  }

  /** Keep at most `k` rows per group, chosen in deterministic
    * ([[hashUnit]](key), key) order — balanced per-group sampling
    * ("at most 10k documents per source") where WHICH rows survive is
    * a pure function of their keys: stable across runs, partitionings,
    * and corpus growth (a group's survivors only change when lower-
    * hashed rows arrive, never by reshuffling). Rows with a null key
    * have no hash position and are excluded, as in [[mixBySource]].
    *
    * Route: `numRanges = 0` (default) ranks with a keyed window — one
    * exchange, right for MANY small groups. For a few corpus-scale
    * groups (sources, languages) pass `numRanges > 0` to rank via
    * [[GroupedRank.rankInGroup]] instead: the window route would sort
    * each group on ONE task. */
  def capPerGroup(df: DataFrame, groupCol: Column, key: Column,
      k: Int, numRanges: Int = 0): DataFrame = {
    require(k > 0, s"capPerGroup: k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val scored = df.filter(key.isNotNull).withColumn("_u", hashUnit(key))
    val ranked =
      if (numRanges > 0)
        GroupedRank.rankInGroup(scored, groupCol,
          Seq(col("_u"), key), "_rn", numRanges)
      else scored.withColumn("_rn", row_number()
        .over(Window.partitionBy(groupCol).orderBy(col("_u"), key))
        .cast("long"))
    ranked.filter(col("_rn") <= k).drop("_u", "_rn")
  }

  /** WEIGHTED reservoir sample per group (Efraimidis–Spirakis A-ES),
    * deterministic: keep each group's `k` rows with the largest
    * u^(1/w), where u is the row's [[hashUnit]]-style uniform and w its
    * weight — selection probability ∝ weight without ever computing
    * group totals, the one-pass weighted sampler a mixture pipeline
    * wants when "sample 10k docs per source, long documents
    * proportionally more often" ([[stratifiedSample]] is the UNweighted
    * count-proportional cousin; [[capPerGroup]] the uniform cap).
    *
    * Ranked in the log domain: es_key = ln(u)/w is monotone with
    * u^(1/w) (exp is increasing), costs one libm call, and is rounded
    * to 6 dp with an id tie-break so the selection is a deterministic,
    * engine-portable pure function of (key, weight). u maps the hash
    * to (0, 1] — never 0, so ln is total. Weights clamp to ≥ 1e-9
    * (A-ES requires w > 0); null keys/groups are excluded.
    *
    * Scale shape: one doc-local projection + the grouped-rank
    * selection — `numRanges > 0` routes through
    * [[GroupedRank.rankInGroup]]'s range-partitioned parallel sorts
    * (few-large-groups contract), else a keyed rank window. Nothing
    * shuffles but the rank exchange.
    *
    * Output: input columns + `es_key` (the selection key, for audit). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: Column, key: Column,
      weight: Column, k: Int, numRanges: Int = 0): DataFrame = {
    require(k > 0, s"weightedSamplePerGroup: k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    // hashUnit's chain, kept in (0, 1]: (h2 + 1) / (P + 1)
    val P = 1000000007L
    val h0 = ShingleExprs.polyFingerprint(key.cast("string"))
    val h1 = pmod(h0 * lit(1103515245L) + lit(12345L), lit(P))
    val h2 = pmod(h1 * lit(69069L) + lit(1L), lit(P))
    val u = (h2 + lit(1L)) / lit(1000000008.0)
    val scored = df.filter(key.isNotNull && groupCol.isNotNull)
      .withColumn("es_key",
        round(log(u) / greatest(weight.cast("double"), lit(1e-9)), 6))
    val ranked =
      if (numRanges > 0)
        GroupedRank.rankInGroup(scored, groupCol,
          Seq(col("es_key").desc, key.asc), "_rn", numRanges)
      else scored.withColumn("_rn", row_number()
        .over(Window.partitionBy(groupCol)
          .orderBy(col("es_key").desc, key.asc))
        .cast("long"))
    ranked.filter(col("_rn") <= k).drop("_rn")
  }

  /** Keep each group's prefix — in ([[hashUnit]](key), key) order —
    * while the running token total stays within `budget`: the
    * token-budget analog of [[capPerGroup]] ("500M tokens per
    * source"). Prefix-truncation, not bin packing: once the cumulative
    * count passes the budget every later row of the group drops, so
    * membership stays a pure prefix property (stable under corpus
    * growth the same way hash splits are). A single row larger than
    * the whole budget is dropped with everything after it. Null keys
    * are excluded, null token counts weigh 0.
    *
    * Route: `numRanges = 0` (default) uses the keyed cumsum window
    * (many small groups); `numRanges > 0` routes through
    * [[GroupedRank.prefixSumInGroup]] for few-large-groups inputs,
    * where the window would drag each group through one task. */
  def capTokensPerGroup(df: DataFrame, groupCol: Column, key: Column,
      tokens: Column, budget: Long, numRanges: Int = 0): DataFrame = {
    require(budget > 0, s"capTokensPerGroup: budget must be > 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(key.isNotNull)
      .withColumn("_toks", coalesce(tokens.cast("long"), lit(0L)))
      .withColumn("_u", hashUnit(key))
    val cum =
      if (numRanges > 0)
        GroupedRank.prefixSumInGroup(base, groupCol,
          Seq(col("_u"), key), col("_toks"), "_cum", numRanges)
      else base.withColumn("_cum", sum(col("_toks"))
        .over(Window.partitionBy(groupCol).orderBy(col("_u"), key)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.filter(col("_cum") <= budget).drop("_toks", "_cum", "_u")
  }

  /** GLOBAL token-budget prefix: keep documents in deterministic
    * ([[hashUnit]](key), key) order while the corpus-wide running token
    * total stays within `budget` — "an unbiased 1B-token slice of the
    * whole corpus", the global form of [[capTokensPerGroup]].
    * Membership is a pure function of the key set (the global order is
    * partitioning-independent), so the slice is re-derivable and grows
    * by appending: raising the budget only ever ADDS documents.
    *
    * Scale shape — the distributed global-prefix-sum, NOT one giant
    * window: a naive global cumsum window (`orderBy` with no
    * `partitionBy`) would drag the whole corpus through a single task.
    * Instead: (1) range-repartition on the order key; (2) one bounded
    * aggregate of per-range sums — #partitions rows — collected and
    * prefix-summed on the driver; (3) per-range cumsum windows (each
    * sorts only its own range, in parallel) plus the broadcast range
    * offset. Ranges whose offset already exceeds the budget are
    * filtered wholesale before their window runs. Null keys are
    * excluded; null token counts weigh 0. */
  def capTokensGlobal(df: DataFrame, key: Column, tokens: Column,
      budget: Long, numRanges: Int = 32): DataFrame = {
    require(budget > 0, s"capTokensGlobal: budget must be > 0, got $budget")
    require(numRanges > 0,
      s"capTokensGlobal: numRanges must be > 0, got $numRanges")
    import org.apache.spark.sql.expressions.Window
    val ranged = df.filter(key.isNotNull)
      .withColumn("_u", hashUnit(key))
      .withColumn("_k", key)
      .withColumn("_toks", coalesce(tokens.cast("long"), lit(0L)))
      .repartitionByRange(numRanges, col("_u"), col("_k"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    // bounded: one row per range — the sanctioned-collect contract
    val partials = ranged.groupBy(col("_pid"))
      .agg(sum(col("_toks")).as("_psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = partials.scanLeft((0, 0L)) {
      case ((_, acc), (pid, s)) => (pid, acc + s)
    }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
    val offCol = offsets.foldLeft(Option.empty[Column]) {
      case (acc, (pid, off)) => Some(acc match {
        case None => when(col("_pid") === pid, off)
        case Some(c) => c.when(col("_pid") === pid, off)
      })
    } match {
      case Some(c) => c.otherwise(0L)
      case None => lit(0L)
    }
    val out = ranged
      .withColumn("_off", offCol)
      // a range that starts past the budget cannot contribute — skip
      // its sort entirely
      .filter(col("_off") < budget)
      .withColumn("_cum", col("_off") + sum(col("_toks"))
        .over(Window.partitionBy(col("_pid"))
          .orderBy(col("_u"), col("_k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cum") <= budget)
      .drop("_u", "_k", "_toks", "_pid", "_off", "_cum")
    out
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

  /** [[exactPercentiles]] for LOW-cardinality groups (sources,
    * languages, shards) — the keyed-window route above sorts each
    * group on ONE task, which is the right trade only when groups are
    * numerous and small. Here the rank comes from
    * [[GroupedRank.rankInGroup]] (range-partitioned parallel sorts +
    * bounded driver offset table), so a 10-source 100 TB corpus sorts
    * on every core instead of ten tasks; group counts are one
    * broadcast aggregate. Same quantile_cont definition, identical
    * output, same oracle. */
  def exactPercentilesGrouped(df: DataFrame, groupCol: String,
      value: Column, ps: Seq[(String, Double)],
      numRanges: Int = 64): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"exactPercentilesGrouped: percentiles must be in [0,1], got $ps")
    val v = df.select(col(groupCol).as("g"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ranked = GroupedRank.rankInGroup(v, col("g"),
      Seq(col("v").asc), "rn", numRanges)
    val counts = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
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
    ranked.join(broadcast(counts), Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: out: _*)
  }

  /** [[exactPercentiles]] over the WHOLE input (no grouping) — the
    * degenerate case where the keyed route would drag every row
    * through ONE window task (`partitionBy` on a constant folds to an
    * empty spec: the "WindowExec: No Partition Defined" single-
    * partition plan). Instead this is the distributed rank from
    * [[capTokensGlobal]]: (1) range-repartition on the value so each
    * of `numRanges` tasks sorts only its slice; (2) ONE bounded
    * aggregate — a row per range — collected and prefix-summed on the
    * driver (the sanctioned-collect contract: #partitions rows, never
    * data); (3) per-range `row_number` windows (each partitioned by
    * range id, sorted in parallel) plus the broadcast offset give the
    * GLOBAL rank, and a single final aggregate picks the two
    * bracketing ranks per percentile. Because the total count is a
    * driver scalar, the bracketing ranks and interpolation fractions
    * are plain literals — the plan carries no per-row count window at
    * all. Same `quantile_cont` definition (pos = p·(n−1), linear
    * interpolation, 6-dp round) as the keyed route, so results are
    * oracle-identical. Output: ONE row with a column per percentile
    * name; empty input → empty output (matching the keyed route's
    * empty groupBy). */
  def exactPercentilesGlobal(df: DataFrame, value: Column,
      ps: Seq[(String, Double)], numRanges: Int = 32,
      roundDp: Int = 6): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"exactPercentilesGlobal: percentiles must be in [0,1], got $ps")
    require(numRanges > 0,
      s"exactPercentilesGlobal: numRanges must be > 0, got $numRanges")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val v = df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ranged = v.repartitionByRange(numRanges, col("v"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    try {
      // bounded: one row per non-empty range
      val partials = ranged.groupBy(col("_pid"))
        .agg(count(lit(1)).as("_c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = partials.map(_._2).sum
      val schema = org.apache.spark.sql.types.StructType(ps.map { case (name, _) =>
        org.apache.spark.sql.types.StructField(name,
          org.apache.spark.sql.types.DoubleType, nullable = true)
      })
      if (n == 0L) return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val offsets = partials.scanLeft((0, 0L)) {
        case ((_, acc), (pid, c)) => (pid, acc + c)
      }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
      val offCol = offsets.foldLeft(Option.empty[Column]) {
        case (acc, (pid, off)) => Some(acc match {
          case None => when(col("_pid") === pid, off)
          case Some(c) => c.when(col("_pid") === pid, off)
        })
      }.map(_.otherwise(0L)).getOrElse(lit(0L))
      // driver-side rank arithmetic: n is a scalar, so the bracketing
      // ranks / fractions are literals, not per-row window counts
      val wanted = ps.map { case (name, p) =>
        val pos = p * (n - 1)
        (name, math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1,
          pos - math.floor(pos))
      }
      val ranked = ranged.withColumn("_rn",
        row_number().over(
          Window.partitionBy(col("_pid")).orderBy(col("v"))) + offCol)
      val aggs = wanted.flatMap { case (name, lo, hi, _) =>
        Seq(max(when(col("_rn") === lo, col("v"))).as(s"_lo_$name"),
          max(when(col("_rn") === hi, col("v"))).as(s"_hi_$name"))
      }
      // roundDp < 0 skips rounding: decimal rounding of a double is only
      // magnitude-safe below ~2^53/10^dp (a µs-scale duration at 1e12
      // already isn't), and the raw lo + frac·(hi−lo) is bit-portable
      // across engines as long as both evaluate that exact IEEE op order
      val out = wanted.map { case (name, _, _, frac) =>
        val interp = col(s"_lo_$name") +
          lit(frac) * (col(s"_hi_$name") - col(s"_lo_$name"))
        (if (roundDp >= 0) round(interp, roundDp) else interp).as(name)
      }
      // ONE bounded row: materialize eagerly so the range cache can be
      // released here instead of leaking into the caller's session
      val row = ranked.agg(aggs.head, aggs.tail: _*).select(out: _*)
        .collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(row.toSeq, 1), schema)
    } finally ranged.unpersist()
  }

  /** Global quantile binning: assign every row its `nBins`-quantile bin
    * of `value` (1-based; bin k covers [b_{k-1}, b_k) with a
    * boundary-valued row going UP) — the stratification primitive
    * behind "train on the top quartile by classifier score" and
    * quality-vs-quantity mixing experiments. Boundaries are the EXACT
    * interpolated percentiles of [[exactPercentiles]], rounded to 6 dp,
    * so bin membership is engine-portable; compose with
    * [[sampleByHash]]/[[mixBySource]] on the bin for per-stratum rates.
    *
    * Scale shape: one distributed global-rank percentile pass
    * ([[exactPercentilesGlobal]] — range-partitioned parallel sorts +
    * driver offset table, never a single-partition window) reduces to a
    * single (nBins−1)-element boundary row that broadcasts onto a
    * one-pass bin projection — the corpus itself is scanned twice and
    * shuffled never.
    * Rows with a null value have no bin and are excluded (they are
    * excluded from the boundaries too).
    *
    * Output: idCol, `value` (double), `bin` (1..nBins). */
  def binByQuantiles(df: DataFrame, value: Column, nBins: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nBins >= 2, s"binByQuantiles: nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(i => (s"_p$i", i.toDouble / nBins))
    val bounds = exactPercentilesGlobal(
      df.select(value.as("_v")), col("_v"), ps)
      .select(array(ps.map(p => col(p._1)): _*).as("_bounds"))
    df.select(col(idCol), value.cast("double").as("value"))
      .filter(col("value").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col(idCol), col("value"),
        (size(filter(col("_bounds"), b => b <= col("value"))) + 1)
          .cast("int").as("bin"))
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

  /** [[approxPercentiles]] with a DISTRIBUTED rank-error audit — the
    * shape that makes sketch percentiles trustworthy at corpus scale:
    * alongside each estimate, verify against the data itself that the
    * returned value's rank lies within the sketch's guarantee
    * (`approx_percentile` is a Greenwald–Khanna summary: the element it
    * returns has rank within n/accuracy of p·n).
    *
    * The audit is two conditional counts per (group, percentile), not a
    * sort: rows ≤ estimate and rows < estimate, both map-side-combining
    * into the same hash aggregate. With ties the admissible interval is
    * [frac_lt − ε, frac_le + ε] ∋ p (the returned element's rank r
    * satisfies frac_lt·n < r ≤ frac_le·n and |r − p·n| ≤ ε·n), which is
    * exactly what `rank_ok` asserts. The estimate row set broadcasts
    * (one row per group × percentile — bounded by group cardinality,
    * the caller's contract for a grouped sketch).
    *
    * Output: groupCol, `pname`, `p`, `n` (group rows), `estimate`,
    * `rank_ok`. Scale: two corpus scans (sketch build + audit), zero
    * corpus shuffles beyond the two hash aggregates' exchanges of
    * group-sized partials. */
  def approxPercentilesGated(df: DataFrame, groupCol: String,
      value: Column, ps: Seq[(String, Double)],
      accuracy: Int = 10000, slack: Double = 0.001): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"approxPercentilesGated: percentiles must be in [0,1], got $ps")
    require(accuracy > 0,
      s"approxPercentilesGated: accuracy must be > 0, got $accuracy")
    val eps = 1.0 / accuracy + slack
    val v = df.select(col(groupCol).as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    val est = approxPercentiles(v, "_g", col("_v"), ps, accuracy)
      .select(col("_g") +: ps.map { case (name, _) => col(name) }: _*)
    // unpivot to one row per (group, percentile): stack is codegen'd
    val stacked = est.select(col("_g"), expr(
      s"stack(${ps.size}, " + ps.map { case (name, p) =>
        s"'$name', ${p}D, `$name`"
      }.mkString(", ") + ") as (pname, p, estimate)"))
    v.join(broadcast(stacked), Seq("_g"))
      .groupBy(col("_g"), col("pname"), col("p"), col("estimate"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_v") <= col("estimate"), 1L).otherwise(0L))
          .as("_le"),
        sum(when(col("_v") < col("estimate"), 1L).otherwise(0L))
          .as("_lt"))
      .select(col("_g").as(groupCol), col("pname"), col("p"), col("n"),
        col("estimate"),
        (col("_lt").cast("double") / col("n") <= col("p") + lit(eps) &&
          col("_le").cast("double") / col("n") >= col("p") - lit(eps))
          .as("rank_ok"))
  }

  /** Corpus snapshot diff: classify every document id across two corpus
    * versions as `added` / `removed` / `changed` / `unchanged` by
    * comparing normalized content hashes — the audit primitive for
    * incremental pipelines ("what did this refresh actually touch?").
    *
    * Scale shape: document TEXT never shuffles — each side reduces to
    * (id, 32-char md5) in a map-side projection before the single
    * id-keyed full-outer join. With `includeUnchanged = false` (the
    * 100 TB audit mode) the output is ∝ churn, not corpus. Rows with a
    * null id have no identity to diff and are excluded on both sides;
    * ids are assumed unique per snapshot (a snapshot is a keyed
    * relation — run [[graft.operators.Dedup.exact]] first if not).
    * A present document with null text carries a null hash: null↔null
    * compares `unchanged` (null-safe equality), null↔text `changed`.
    *
    * Output: idCol, `status`, `old_hash`, `new_hash`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      includeUnchanged: Boolean = true): DataFrame = {
    def side(df: DataFrame, hash: String, present: String) =
      df.filter(col(idCol).isNotNull)
        .select(col(idCol), md5(lower(trim(col(textCol)))).as(hash),
          lit(true).as(present))
    val joined = side(oldDf, "old_hash", "_o")
      .join(side(newDf, "new_hash", "_n"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_o").isNull, "added")
          .when(col("_n").isNull, "removed")
          .when(col("old_hash") <=> col("new_hash"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_hash"), col("new_hash"))
    if (includeUnchanged) joined else joined.filter(col("status") =!= "unchanged")
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

  /** Deterministic negative sampling for contrastive training: for each
    * anchor document, `k` partner documents that are NOT near-duplicates
    * of it. Candidates come from a fixed modular walk over the id space
    * (cand_j = pmod(anchor + j·7919, maxId+1), j = 1..k+oversample) —
    * engine-replayable, join-stable, and uniform-ish without any RNG
    * state; candidates that do not exist, equal the anchor, or share a
    * duplicate CLUSTER with it (components over the supplied near-dup
    * pair list, so transitively-linked near-dups are excluded — the
    * same leakage rule as [[graft.operators.Graph.clusterAwareSplit]])
    * are dropped, and the first `k` survivors by walk order are kept.
    * `oversample` is the slack absorbing those drops; anchors inside
    * huge clusters may return fewer than k.
    *
    * Scale shape: the walk is a generator projection (k+oversample rows
    * per doc); existence and cluster checks are key-equality joins
    * (components working set ∝ duplicates); the final rank window
    * partitions by anchor over ≤ k+oversample rows each. The one driver
    * scalar is max(id).
    *
    * Output: (anchor_id, neg_id, rank 1..k). */
  def negativeSamples(docs: DataFrame, pairs: DataFrame, k: Int,
      oversample: Int = 4, idCol: String = "doc_id",
      srcCol: String = "doc_a", dstCol: String = "doc_b"): DataFrame = {
    require(k >= 1, s"negativeSamples: k must be >= 1, got $k")
    require(oversample >= 0,
      s"negativeSamples: oversample must be >= 0, got $oversample")
    import org.apache.spark.sql.expressions.Window
    val ids = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"))
    val maxRow = ids.agg(max(col("id"))).collect().head
    if (maxRow.isNullAt(0))
      return ids.select(col("id").as("anchor_id"),
        col("id").as("neg_id"), col("id").as("rank"))
    val m = maxRow.getLong(0) + 1
    val cand = ids.select(col("id").as("anchor_id"),
        explode(sequence(lit(1), lit(k + oversample))).as("j"))
      .withColumn("cand",
        pmod(col("anchor_id") + col("j") * 7919L, lit(m)))
      .filter(col("cand") =!= col("anchor_id"))
      .join(ids.select(col("id").as("cand")), "cand")
    val cc = Graph.connectedComponents(pairs, srcCol, dstCol)
    val filtered = cand
      .join(cc.select(col("node").as("anchor_id"),
        col("component").as("_ca")), Seq("anchor_id"), "left")
      .join(cc.select(col("node").as("cand"),
        col("component").as("_cb")), Seq("cand"), "left")
      .filter(coalesce(col("_ca"), col("anchor_id")) =!=
        coalesce(col("_cb"), col("cand")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("_j"), col("cand"))
    filtered.groupBy(col("anchor_id"), col("cand"))
      .agg(min(col("j")).as("_j"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("cand").as("neg_id"),
        col("rank").cast("long").as("rank"))
  }

  /** Per-group bottom-fraction filter — "drop each source's worst
    * quartile by quality score", the FineWeb-style curation step
    * where the threshold is RELATIVE per group rather than a global
    * constant (a clean source's median beats a spammy source's p90,
    * so one global cutoff over- or under-prunes every source).
    *
    * The contract is exact and deterministic: within each group,
    * rows rank ascending by (`score`, `idCol`) and the lowest
    * ⌊dropFraction · n⌋ rows drop. Rows with a null score sort first
    * (Spark asc default) and are pruned preferentially.
    *
    * Scale shape: ranking is
    * [[graft.operators.GroupedRank.rankInGroup]] (range-partitioned
    * parallel sorts + bounded driver offset table — never a
    * one-task-per-source window); group sizes are one broadcast
    * aggregate; the gate itself is a projection-level comparison.
    *
    * Output: the input columns plus `scoreName`, kept rows only. */
  def percentileGate(df: DataFrame, score: Column, grpCol: String,
      idCol: String, dropFraction: Double = 0.25,
      scoreName: String = "score"): DataFrame = {
    require(dropFraction >= 0 && dropFraction < 1,
      s"percentileGate: dropFraction must be in [0, 1), got $dropFraction")
    val scored = df.withColumn(scoreName, score)
    val ranked = GroupedRank.rankInGroup(scored, col(grpCol),
      Seq(col(scoreName).asc, col(idCol).asc), "_pg_rn")
    // counts from the RANKED relation (same rows, one added column):
    // it reads rankInGroup's persisted range-exchange cache, where
    // aggregating `scored` would re-execute the scoring scan — free
    // here, a full second pipeline pass when the score is expensive
    val counts = ranked.groupBy(col(grpCol))
      .agg(count(lit(1)).as("_pg_n"))
    ranked.join(broadcast(counts), Seq(grpCol))
      .filter(col("_pg_rn") >
        floor(lit(dropFraction) * col("_pg_n")).cast("long"))
      .drop("_pg_rn", "_pg_n")
  }
}
