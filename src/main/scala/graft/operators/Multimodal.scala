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
}
