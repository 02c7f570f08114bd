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
    * this environment). Real deployments plug javax.imageio / ffmpeg here. */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], width: Int, height: Int): DecodedFrame = {
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc += (payload(i) & 0xff); i += 1 }
      val luma = if (payload.isEmpty) 0.0
        else acc.toDouble / payload.length / 255.0
      val features = Array.tabulate(8) { j =>
        val idx = if (payload.isEmpty) 0 else (payload((j * 31) % payload.length) & 0xff)
        idx / 255.0f
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
