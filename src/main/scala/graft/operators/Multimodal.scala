package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as per-partition batch transforms over typed Datasets.
  *
  * The container has no image/audio codecs, so the decode step is STUBBED
  * behind [[MediaDecoder]] with a deterministic fake — the Spark-side
  * plumbing (schema, partitioning, batch iteration shape) is real and
  * tested. Swap [[FakeDecoder]] for a codec-backed implementation in a
  * real deployment; nothing else changes.
  *
  * Scale notes: payloads never pass through a shuffle — decode runs
  * map-side on the scan partition; only small feature rows (metadata +
  * fixed-width vectors) flow downstream. Partition sizing is controlled by
  * `spark.sql.files.maxPartitionBytes`, so a 100 TB media corpus splits
  * into bounded-memory decode tasks.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(mediaId: Long, mediaType: String, payload: Array[Byte],
      width: Int, height: Int, durationMs: Long)

  /** Decoded/derived features (fixed-width — safe to shuffle/aggregate). */
  case class MediaFeatures(mediaId: Long, mediaType: String, byteLen: Long,
      nFrames: Int, meanLuma: Double, featureVec: Array[Float])

  /** Decode boundary. Implementations must be pure and thread-safe; they
    * are invoked once per record inside mapPartitions. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], width: Int, height: Int): DecodedFrame
  }
  case class DecodedFrame(luma: Double, features: Array[Float])

  /** STUB decoder: deterministic arithmetic over raw bytes (no codec in
    * this environment). Real deployments plug javax.imageio / ffmpeg here.
    * Features are CENTERED ((byte − 128) / 128 ∈ [−1, 1)) so cosine over
    * them discriminates: uncentered byte samples of any two text-like
    * payloads are all-positive and near-collinear (cosine ≈ 1 for
    * everything), which would make feature-space near-dedup vacuous.
    * (b − 128)/128 is exact in Float — integer over a power of two — so
    * the SQL oracle's double arithmetic reproduces it bit-for-bit. */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], width: Int, height: Int): DecodedFrame = {
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc += (payload(i) & 0xff); i += 1 }
      val luma = if (payload.isEmpty) 0.0
        else acc.toDouble / payload.length / 255.0
      val features = Array.tabulate(16) { j =>
        val b = if (payload.isEmpty) 0
          else payload((j * 31) % payload.length) & 0xff
        (b - 128) / 128.0f
      }
      DecodedFrame(luma, features)
    }
  }

  /** Frame-sample interval in bytes for the stub "video" path. */
  val FrameBytes = 256

  /** Decode + feature-extract pipeline: per-partition batch iteration,
    * one decoder instance per task, fixed-width outputs. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = decoder.decode(m.payload, m.width, m.height)
        MediaFeatures(m.mediaId, m.mediaType, m.payload.length.toLong,
          nFrames = math.max(1, m.payload.length / FrameBytes),
          meanLuma = d.luma, featureVec = d.features)
      }
    }
  }

  /** One sampled frame: parent media id + frame index + per-frame
    * features (fixed-width — safe to shuffle/aggregate). */
  case class FrameSample(mediaId: Long, frameIdx: Int, luma: Double,
      features: Array[Float])

  /** Frame sampling: split the payload into fixed-size frame windows,
    * decode every `stride`-th one, emit one row per sampled frame. The
    * per-record fan-out happens map-side (one iterator pass, no
    * intermediate collection of all frames), so a long video expands
    * into frame rows without materializing them in executor memory. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4,
      decoder: MediaDecoder = FakeDecoder): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    require(stride >= 1, "stride must be >= 1")
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = math.max(1, m.payload.length / FrameBytes)
        Iterator.range(0, nFrames, stride).map { f =>
          val from = f * FrameBytes
          val until = math.min(from + FrameBytes, m.payload.length)
          val frame = java.util.Arrays.copyOfRange(m.payload, from,
            math.max(until, from))
          val d = decoder.decode(frame, m.width, m.height)
          FrameSample(m.mediaId, f, d.luma, d.features)
        }
      }
    }
  }

  /** "Resize" stub: deterministic byte-domain downsample of the payload
    * to a target size (every ceil(len/target)-th byte). Real deployments
    * replace the byte loop with a codec resize; the Spark plumbing —
    * map-side transform, no shuffle, bounded output width — is the part
    * that survives the swap. */
  def resizePayload(media: Dataset[MediaRecord],
      targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(targetBytes >= 1, "targetBytes must be >= 1")
    media.mapPartitions { it =>
      it.map { m =>
        if (m.payload.length <= targetBytes) m
        else {
          val step = math.ceil(m.payload.length.toDouble / targetBytes).toInt
          val out = Array.ofDim[Byte]((m.payload.length + step - 1) / step)
          var i = 0
          while (i < out.length) { out(i) = m.payload(i * step); i += 1 }
          m.copy(payload = out)
        }
      }
    }
  }

  /** Synthesize a media table from `documents` (text bytes as payload) —
    * lets the plumbing run against harness data. Pure column expressions,
    * so the byte-level stats are oracle-checkable. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/blob").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Column-level byte stats over a binary payload column (the
    * SQL-expressible slice of the pipeline, used for the oracle query). */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).cast("long").as("byte_len"),
      greatest(floor(length(col("payload")) / FrameBytes), lit(1))
        .cast("long").as("n_frames"))

  /** Perceptual (feature-level) near-duplicate media pairs — the pass
    * after [[dedupPayloads]]'s byte-identity: decode each payload to
    * its fixed-width feature vector, generate candidates through
    * quantized-feature CHUNK keys (the x3 SimHash pigeonhole
    * discipline at feature level), verify with exact cosine ≥
    * `threshold`. Catches re-encoded / resized / lightly-edited copies
    * that byte-identity misses — the second pass every scraped media
    * corpus runs after exact dedup.
    *
    * Blocking: the 16 feature coordinates split into 4 chunk keys of
    * 4 RAW coordinates each (exact float values — no quantization: a
    * byte-level edit moves a sampled byte arbitrarily, never by one
    * quantum, so a quantization band would add hot-key risk and buy
    * zero recall; measured on this corpus, 16-wide quantization
    * collapses ASCII letters into ~2 buckets per coordinate and
    * re-creates the quadratic). A pair is a candidate iff it shares
    * ANY chunk key, so by pigeonhole every pair whose feature vectors
    * differ in ≤ 3 of 16 coordinates is GUARANTEED a candidate —
    * byte-identical payloads agree everywhere, and a light edit moves
    * at most the few sampled coordinates it touches. More-divergent
    * pairs are best-effort (the declared one-sided LSH trade, same as
    * SimHash's Hamming pigeonhole — x3). Empty payloads carry no
    * perceptual content and never pair; zero-norm vectors drop via
    * the null cosine.
    *
    * Scale shape: decode is map-side on the scan partition and runs
    * ONCE (the feature relation is [[Materialize]]d; payloads never
    * shuffle — the key join moves only (id, chunk key) rows, the
    * vectors ride no wider than the two final join-backs); candidate
    * generation is a key-equality join on chunk keys — candidates ∝
    * duplicate mass, never corpus² (a single mean-luma band was
    * measured collapsing this corpus into a few hot bands → a 6M-pair
    * quadratic verify, 9 s at sf0.1; 4-coordinate content keys collide
    * only on near-identical features). Id pairs DEDUPE BEFORE the
    * cosine: a pair sharing k ≤ 4 chunk keys verifies once, not k
    * times — at 16 stub floats that is a micro-saving, but with a real
    * perceptual embedding (512+ dims) one-verify-per-pair and a
    * vector-free key shuffle are the difference between the join
    * moving kilobytes or megabytes per candidate.
    * Output: (media_a, media_b, cosine). */
  def nearDupPairs(media: Dataset[MediaRecord], threshold: Double = 0.9,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"nearDupPairs: threshold must be in (0, 1], got $threshold")
    val feats = Materialize.eager(featureRelation(media, decoder))
    val keys = explodeChunkKeys(feats)
    keys.as("a").join(keys.as("b"),
        keyEquality && col("a.id") < col("b.id"))
      .select(col("a.id").as("media_a"), col("b.id").as("media_b"))
      .distinct() // a pair may share up to 4 chunk keys — verify once
      .join(feats.select(col("id").as("media_a"), col("v").as("_va")),
        Seq("media_a"))
      .join(feats.select(col("id").as("media_b"), col("v").as("_vb")),
        Seq("media_b"))
      .select(col("media_a"), col("media_b"),
        round(Similarity.cosine(col("_va"), col("_vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The deduped feature relation behind the pair routes: one row per
    * non-empty media — `(id, v)`. */
  private def featureRelation(media: Dataset[MediaRecord],
      decoder: MediaDecoder): DataFrame =
    extractFeatures(
        media.filter((m: MediaRecord) => m.payload.nonEmpty), decoder)
      .select(col("mediaId").as("id"), col("featureVec").as("v"))

  /** The vector-FREE chunk-key relation the candidate join shuffles:
    * one row per (id, chunk j) — `(id, j, k1..k4)`. */
  private def explodeChunkKeys(feats: DataFrame): DataFrame =
    feats.select(col("id"),
        posexplode(array((0 until 4).map(j => struct(
          (1 to 4).map(c =>
            element_at(col("v"), 4 * j + c).as(s"k$c")): _*)): _*)))
      .select(col("id"), col("pos").as("j"),
        col("col.k1").as("k1"), col("col.k2").as("k2"),
        col("col.k3").as("k3"), col("col.k4").as("k4"))

  /** The SELF-CONTAINED feature/chunk-key relation persisted as the
    * index: one row per (media id, chunk j) — `(id, v, j, k1..k4)`.
    * The vector rides along so the index alone can verify candidates
    * (the delta probe joins on the key columns only and reads `v`
    * back per surviving pair). */
  private def chunkKeys(media: Dataset[MediaRecord],
      decoder: MediaDecoder): DataFrame =
    featureRelation(media, decoder)
      .select(col("id"), col("v"),
        posexplode(array((0 until 4).map(j => struct(
          (1 to 4).map(c =>
            element_at(col("v"), 4 * j + c).as(s"k$c")): _*)): _*)))
      .select(col("id"), col("v"), col("pos").as("j"),
        col("col.k1").as("k1"), col("col.k2").as("k2"),
        col("col.k3").as("k3"), col("col.k4").as("k4"))

  private def keyEquality =
    col("a.j") === col("b.j") && col("a.k1") === col("b.k1") &&
      col("a.k2") === col("b.k2") && col("a.k3") === col("b.k3") &&
      col("a.k4") === col("b.k4")

  /** The persistable media near-dup index: [[nearDupPairs]]'s
    * feature/chunk-key relation of the CORPUS — what an incremental
    * pipeline writes once (bucket or sort by the chunk key so the
    * delta probe co-locates) and probes per batch
    * ([[graft.operators.Dedup.cdcChunkIndex]]'s contract on the
    * binary modality). Columns: `(media_id, v, j, k1..k4)`. */
  def nearDupIndex(media: Dataset[MediaRecord],
      decoder: MediaDecoder = FakeDecoder): DataFrame =
    chunkKeys(media, decoder).withColumnRenamed("id", "media_id")

  /** Incremental perceptual near-dedup: decode ONLY the delta batch
    * and probe a persisted [[nearDupIndex]] — cost ∝ |delta|, the
    * corpus is never re-decoded (the
    * [[graft.operators.Dedup.cdcOverlapDelta]] discipline on the
    * binary modality). Output `(media_delta, media_corpus, cosine)` —
    * equal to [[nearDupPairs]] over (corpus ∪ delta) restricted to
    * cross pairs, with the delta id first (law-tested). Media ids
    * must be disjoint across the two sides, the same precondition as
    * every delta route. */
  def nearDupDelta(delta: Dataset[MediaRecord], index: DataFrame,
      threshold: Double = 0.9,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"nearDupDelta: threshold must be in (0, 1], got $threshold")
    val dfeats = Materialize.eager(featureRelation(delta, decoder))
    // the candidate join moves only (id, chunk key) rows — vectors
    // join back per DEDUPED surviving pair (one cosine per pair, the
    // nearDupPairs discipline; the index's v column is read only on
    // the pair side, key-restricted)
    val dk = explodeChunkKeys(dfeats)
    val ik = index.select(col("media_id").as("id"), col("j"),
      col("k1"), col("k2"), col("k3"), col("k4"))
    val pairs = dk.as("a").join(ik.as("b"), keyEquality)
      .select(col("a.id").as("media_delta"),
        col("b.id").as("media_corpus"))
      .distinct()
    val corpusV = index.select(col("media_id").as("media_corpus"),
        col("v").as("_vb"))
      .dropDuplicates("media_corpus")
    pairs
      .join(dfeats.select(col("id").as("media_delta"),
        col("v").as("_va")), Seq("media_delta"))
      .join(corpusV, Seq("media_corpus"))
      .select(col("media_delta"), col("media_corpus"),
        round(Similarity.cosine(col("_va"), col("_vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** One micro-batch step of streaming perceptual media dedup
    * ([[graft.streaming.StreamMediaDedup]]): all near-dup pairs
    * TOUCHING the batch — batch↔corpus and batch-internal — over
    * already-computed feature/chunk-key relations (the
    * [[nearDupIndex]] schema `(media_id, v, j, k1..k4)` on both
    * sides; the [[graft.operators.Dedup.cdcOverlapIncrement]] shape
    * on the binary modality). The probe side is the batch only, so
    * corpus-internal pairs can never form (they were emitted when
    * THEIR later member arrived — each pair exactly once);
    * batch-internal pairs arrive in both join orders and are
    * canonicalized by least/greatest + distinct.
    *
    * Scale shape: corpus postings are key-restricted to the batch's
    * chunk keys before anything else — per-batch shuffle ∝ batch keys
    * + matching postings, never O(corpus index) (the corpus-side SCAN
    * is the caller's concern: [[graft.streaming.StreamMediaDedup]]
    * partition-prunes it by feature bucket). The candidate join moves
    * vector-free (id, chunk key) rows; vectors join back per DEDUPED
    * surviving pair — one cosine per pair (the [[nearDupPairs]]
    * discipline). Output: `(media_a, media_b, cosine)`, media_a <
    * media_b. Ids must be globally unique across batches. */
  def nearDupIncrement(batchKeys: DataFrame, corpusKeys: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"nearDupIncrement: threshold must be in (0, 1], got $threshold")
    val cols = Seq("media_id", "v", "j", "k1", "k2", "k3", "k4").map(col)
    val kcols = Seq("j", "k1", "k2", "k3", "k4")
    val bk = batchKeys.select(cols: _*)
    val corpusHits = corpusKeys.select(cols: _*)
      .join(bk.select(kcols.map(col): _*).distinct(), kcols)
      .select(cols: _*)
    // materialized once for its three consumers (probe side, b side,
    // vector join-back) — without it the corpus index read repeats
    val all = Materialize.eager(bk.unionByName(corpusHits))
    val keysOnly = all.select((col("media_id").as("id") +:
      kcols.map(col)): _*)
    val probe = keysOnly.join(
      batchKeys.select(col("media_id").as("id")).distinct(), Seq("id"))
    val pairs = probe.as("a").join(keysOnly.as("b"),
        keyEquality && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("media_a"),
        greatest(col("a.id"), col("b.id")).as("media_b"))
      .distinct()
    val vrel = all.select(col("media_id"), col("v"))
      .dropDuplicates("media_id")
    pairs
      .join(vrel.select(col("media_id").as("media_a"),
        col("v").as("_va")), Seq("media_a"))
      .join(vrel.select(col("media_id").as("media_b"),
        col("v").as("_vb")), Seq("media_b"))
      .select(col("media_a"), col("media_b"),
        round(Similarity.cosine(col("_va"), col("_vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Sub-file (frame-level) media overlap: pairs of media sharing ≥
    * `minSharedFrames` DISTINCT near-identical frames — the
    * [[graft.operators.Dedup.cdcOverlapPairs]] shape on the video
    * modality, where the natural sub-document unit is the FRAME (a
    * fixed window is the right model here, unlike byte streams where
    * CDC earns its shift-robustness: frames are positionally defined
    * by the container, so an inserted frame shifts nothing). Catches
    * re-cut / re-intro'd / partially-reused footage that whole-file
    * routes ([[nearDupPairs]]) miss.
    *
    * Frame identity = the decoder's per-frame feature vector, used as
    * the key itself (exact equality; the stub's 16-point byte sample —
    * a real deployment swaps in a perceptual frame hash and nothing
    * else changes). Frames present in more than `maxMediaPerFrame`
    * media are dropped BEFORE pairing — the [[Dedup.removeBoilerplate]]
    * rule: an intro/outro card in k videos would emit k² pairs and is
    * not reuse evidence.
    *
    * Scale shape: frame decode is map-side fan-out (one iterator pass,
    * payloads never shuffle — only (id, feature-key) rows move);
    * per-media frame keys dedupe map-side; the cap is the
    * agg + join-back discipline (never a keyed window); the pair join
    * is key-equality on the frame key — candidates ∝ shared-frame
    * mass, never corpus². Output: (media_a, media_b, shared_frames). */
  def frameOverlapPairs(media: Dataset[MediaRecord], stride: Int = 1,
      minSharedFrames: Int = 2, maxMediaPerFrame: Int = 64,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(minSharedFrames >= 1,
      s"frameOverlapPairs: minSharedFrames must be >= 1, got " +
        s"$minSharedFrames")
    require(maxMediaPerFrame >= 2,
      s"frameOverlapPairs: maxMediaPerFrame must be >= 2, got " +
        s"$maxMediaPerFrame")
    val fr = Materialize.eager(sampleFrames(
        media.filter((m: MediaRecord) => m.payload.nonEmpty), stride,
        decoder)
      .select(col("mediaId").as("_id"), col("features").as("fk"))
      .distinct())
    val survivors = fr.groupBy(col("fk"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxMediaPerFrame && col("_n") >= 2)
      .select(col("fk"))
    val keyed = fr.join(survivors, Seq("fk"))
    keyed.as("a").join(keyed.as("b"),
        col("a.fk") === col("b.fk") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("media_a"), col("b._id").as("media_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** The persistable frame-level index: [[frameOverlapPairs]]'s
    * (frame-key → media) posting relation — one row per DISTINCT
    * `(fk, media_id)`, what an incremental pipeline writes once and
    * probes per batch ([[graft.operators.Dedup.cdcChunkIndex]]'s
    * contract at frame granularity). Frame decode is map-side
    * fan-out; only fixed-width (media_id, feature-key) rows flow. */
  def frameIndex(media: Dataset[MediaRecord], stride: Int = 1,
      decoder: MediaDecoder = FakeDecoder): DataFrame =
    sampleFrames(media.filter((m: MediaRecord) => m.payload.nonEmpty),
        stride, decoder)
      .select(col("mediaId").as("media_id"), col("features").as("fk"))
      .distinct()

  /** Incremental frame-level overlap: decode ONLY the delta batch and
    * probe a persisted [[frameIndex]] — re-cut detection over a
    * growing video corpus never re-decodes the corpus (the
    * [[graft.operators.Dedup.cdcOverlapDelta]] discipline at frame
    * granularity, closing the one dedup family member that had no
    * incremental shape). Output `(media_delta, media_corpus,
    * shared_frames)` — EQUAL to [[frameOverlapPairs]] over
    * (corpus ∪ delta) restricted to cross pairs, with the delta id
    * first (law-tested, the [[nearDupDelta]] recipe): the boilerplate
    * cap counts each frame key's media over delta ∪ matching corpus
    * postings, which equals the union frequency for every key that
    * can form a cross pair. Media ids must be disjoint across the two
    * sides, the same precondition as every delta route.
    *
    * Scale shape: corpus postings are key-restricted to the batch's
    * frame keys BEFORE any counting (per-call shuffle ∝ delta frames
    * + matching postings, never the index); the cap is the
    * agg + join-back discipline — never a keyed window. */
  def frameOverlapDelta(delta: Dataset[MediaRecord], index: DataFrame,
      stride: Int = 1, minSharedFrames: Int = 2,
      maxMediaPerFrame: Int = 64,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(minSharedFrames >= 1,
      s"frameOverlapDelta: minSharedFrames must be >= 1, got " +
        s"$minSharedFrames")
    require(maxMediaPerFrame >= 2,
      s"frameOverlapDelta: maxMediaPerFrame must be >= 2, got " +
        s"$maxMediaPerFrame")
    // delta frames materialize once for their three consumers (index
    // restriction + frequency + pair join); hits likewise (frequency
    // + join-back)
    val dk = Materialize.eager(frameIndex(delta, stride, decoder)
      .withColumnRenamed("media_id", "media_delta"))
    val hits = Materialize.eager(index
      .select(col("fk"), col("media_id").as("media_corpus"))
      .join(dk.select(col("fk")).distinct(), Seq("fk")))
    val survivors = dk.select(col("fk"))
      .unionByName(hits.select(col("fk")))
      .groupBy(col("fk")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxMediaPerFrame && col("_n") >= 2)
      .select(col("fk"))
    val capped = hits.join(survivors, Seq("fk"))
    dk.join(capped, Seq("fk"))
      .groupBy(col("media_delta"), col("media_corpus"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** One micro-batch step of streaming frame-level overlap
    * ([[graft.streaming.StreamFrameOverlap]]): all overlap pairs
    * TOUCHING the batch — batch↔corpus and batch-internal — over
    * already-computed frame-posting relations (the [[frameIndex]]
    * schema `(media_id, fk)` on both sides; the [[nearDupIncrement]]
    * recipe at frame granularity). The probe side is the batch only,
    * so corpus-internal pairs can never form; batch-internal pairs
    * arrive in both join orders and are canonicalized by
    * least/greatest + a per-(pair, key) distinct, so each shared key
    * counts once — `shared_frames` matches [[frameOverlapPairs]]'s
    * distinct-key count. Output `(media_a, media_b, shared_frames)`,
    * media_a < media_b. Ids must be globally unique across batches.
    *
    * The boilerplate cap counts each key over batch ∪ matching corpus
    * postings — the union frequency AS OF this batch. A key can cross
    * `maxMediaPerFrame` in a LATER batch, after pairs sharing it were
    * already emitted; the deviation from the batch law is one-sided
    * (the stream may keep pairs / count keys a full recompute would
    * drop, never the reverse) — [[graft.streaming.StreamCdc]]'s
    * cap-crossing contract, law-tested in StreamFrameOverlapSpec.
    *
    * Scale shape: corpus postings are key-restricted to the batch's
    * frame keys before any counting (per-batch shuffle ∝ batch frames
    * + matching postings, never the index — the corpus-side SCAN is
    * the caller's concern: [[graft.streaming.StreamFrameOverlap]]
    * partition-prunes it by key bucket); the cap is agg + join-back —
    * never a keyed window. */
  def frameOverlapIncrement(batchKeys: DataFrame, corpusKeys: DataFrame,
      minSharedFrames: Int = 2, maxMediaPerFrame: Int = 64): DataFrame = {
    require(minSharedFrames >= 1,
      s"frameOverlapIncrement: minSharedFrames must be >= 1, got " +
        s"$minSharedFrames")
    require(maxMediaPerFrame >= 2,
      s"frameOverlapIncrement: maxMediaPerFrame must be >= 2, got " +
        s"$maxMediaPerFrame")
    val bk = batchKeys.select(col("media_id"), col("fk"))
    val hits = corpusKeys.select(col("media_id"), col("fk"))
      .join(bk.select(col("fk")).distinct(), Seq("fk"))
    // materialized once for its three consumers (frequency, probe
    // side, pair side) — without it the corpus index read repeats
    val all = Materialize.eager(bk.unionByName(hits))
    val survivors = all.groupBy(col("fk"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxMediaPerFrame && col("_n") >= 2)
      .select(col("fk"))
    val capped = all.join(survivors, Seq("fk"))
    val probe = capped.join(
      bk.select(col("media_id")).distinct(), Seq("media_id"))
    probe.as("a").join(capped.as("b"),
        col("a.fk") === col("b.fk") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(least(col("a.media_id"), col("b.media_id")).as("media_a"),
        greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
        col("a.fk").as("fk"))
      .distinct() // batch-internal pairs arrive in both orders
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** Cross-modal duplicate clusters: connected components over the
    * UNION of two edge modalities —
    *
    *  - '''text''': documents sharing a normalized paragraph of ≥
    *    `minParaLen` chars (split on `delimiter`, lower/trim, df-capped
    *    at `maxParaDf` — partial textual overlap the sampled-byte
    *    media features cannot see);
    *  - '''media''': perceptual near-dup pairs over the documents'
    *    payloads ([[nearDupPairs]] at `threshold` — byte-level
    *    similarity that survives textual rewording of unsampled
    *    regions).
    *
    * A re-encoded copy B of A and a quote-heavy derivative C of B land
    * in ONE cluster even though no single modality links all three —
    * the dedup decision a multimodal training pipeline actually needs
    * (drop/keep per CLUSTER, not per pairwise detector). Output:
    * `(node, component)` — [[Graph.connectedComponents]]'s contract,
    * component = min doc_id reachable; singleton docs (no edge in
    * either modality) are omitted, the x55 convention.
    *
    * Scale shape: text edges are one hash aggregate on the paragraph
    * hash (map-side combinable, df-capped — boilerplate paragraphs
    * drop before the join-back) plus one key-equality join-back —
    * star edges (canonical → member), never the within-group
    * quadratic; media edges are [[nearDupPairs]]'s chunk-key
    * candidates (∝ duplicate mass); components run on the edge union
    * (∝ edges, the x24 discipline — driver union-find under the
    * bounded-edges gate, label propagation beyond it). */
  def crossModalComponents(docs: DataFrame, delimiter: String = " the ",
      minParaLen: Int = 20, maxParaDf: Int = 16,
      threshold: Double = 0.999,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(maxParaDf >= 2,
      s"crossModalComponents: maxParaDf must be >= 2, got $maxParaDf")
    val paras = paragraphKeys(docs, delimiter, minParaLen)
    val canon = paras.groupBy(col("h"))
      .agg(min(col("doc_id")).as("_c"), count(lit(1)).as("_df"))
      .filter(col("_df") > 1 && col("_df") <= maxParaDf)
      .select(col("h"), col("_c"))
    val textEdges = paras.join(canon, Seq("h"))
      .filter(col("doc_id") =!= col("_c"))
      .select(col("_c").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
    val mediaEdges = nearDupPairs(docsAsMedia(docs), threshold, decoder)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    Graph.connectedComponents(textEdges.unionByName(mediaEdges))
  }

  /** [[mediaFromDocuments]] lifted to the typed [[MediaRecord]] shape
    * the perceptual routes consume. */
  def docsAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    mediaFromDocuments(docs)
      .select(col("media_id").as("mediaId"),
        col("media_type").as("mediaType"), col("payload"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("durationMs"))
      .as[MediaRecord]
  }

  /** The normalized-paragraph posting relation behind the cross-modal
    * text edges: one row per distinct (doc, paragraph hash) —
    * `(doc_id, h)`. Only the 64-bit xxhash64 of the lower/trimmed
    * paragraph ever shuffles (the [[SpanDedup]] collision stance);
    * paragraph text stays doc-local. */
  def paragraphKeys(docs: DataFrame, delimiter: String = " the ",
      minParaLen: Int = 20): DataFrame = {
    require(minParaLen >= 1,
      s"paragraphKeys: minParaLen must be >= 1, got $minParaLen")
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(col("text"), java.util.regex.Pattern
          .quote(delimiter))).as("_p"))
      .select(col("doc_id"), lower(trim(col("_p"))).as("_p"))
      .filter(length(col("_p")) >= minParaLen)
      .select(col("doc_id"), xxhash64(col("_p")).as("h"))
      .distinct()
  }

  /** One micro-batch step of streaming paragraph-sharing edges
    * ([[graft.streaming.StreamCrossModal]]'s text modality): the
    * star edges (canonical = min doc_id → member) of every paragraph
    * key TOUCHING the batch, df-capped over batch ∪ matching corpus
    * postings (the union frequency as of this batch). Emitting the
    * full current star per qualifying key — corpus members included —
    * keeps the accumulated edge relation connectivity-equal to the
    * batch star over the final union for every key that never crosses
    * `maxParaDf` (a doc that arrived before its key qualified is
    * wired in when the key's second member lands); a later crossing
    * deviates one-sided only (emitted edges stay — the stream's
    * clusters may be coarser than the recompute's, never finer). The
    * same edge can re-emit across batches as a key gains members —
    * the product is the LABELS relation, where duplicates are free.
    *
    * Scale shape: corpus postings are key-restricted to the batch's
    * paragraph hashes before any counting (per-batch shuffle ∝ batch
    * paragraphs + matching postings, never the index; the corpus-side
    * SCAN is the caller's concern — the sink partition-prunes it by
    * hash bucket); the cap is agg + join-back, never a keyed
    * window. */
  def paragraphEdgeIncrement(batchKeys: DataFrame,
      corpusKeys: DataFrame, maxParaDf: Int = 16): DataFrame = {
    require(maxParaDf >= 2,
      s"paragraphEdgeIncrement: maxParaDf must be >= 2, got $maxParaDf")
    val bk = batchKeys.select(col("doc_id"), col("h"))
    val hits = corpusKeys.select(col("doc_id"), col("h"))
      .join(bk.select(col("h")).distinct(), Seq("h"))
    // materialized once for its two consumers (canonical/df aggregate
    // + edge join-back)
    val all = Materialize.eager(bk.unionByName(hits))
    val canon = all.groupBy(col("h"))
      .agg(min(col("doc_id")).as("_c"), count(lit(1)).as("_df"))
      .filter(col("_df") > 1 && col("_df") <= maxParaDf)
      .select(col("h"), col("_c"))
    all.join(canon, Seq("h"))
      .filter(col("doc_id") =!= col("_c"))
      .select(col("_c").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact payload dedup: group BYTE-identical payloads (md5 over the
    * raw binary — no text normalization; a payload is opaque), keep the
    * smallest id — [[Dedup.exact]]'s contract for the binary modality.
    * Same scale shape: one hash aggregate on 16-byte keys; payload
    * bytes reduce map-side and never shuffle. The standard first pass
    * over a scraped image/audio corpus, where byte-identical dupes
    * (mirrors, re-uploads, CDN copies) dominate. */
  def dedupPayloads(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.groupBy(unhex(md5(col(payloadCol))).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))
}
