package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads
  * travel as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extraction runs as partition-batched transforms.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * lineage — is real and tested. The codec itself is a STUB (marked
  * below): this container has no image/audio libraries, so
  * [[Codec.decodeStub]] produces deterministic fake features from the
  * payload bytes. Swapping in a real decoder changes ONE function and
  * nothing about the distributed plan.
  *
  * Scale notes: payloads never pass through a shuffle here — feature
  * extraction is mapPartitions (map-only); downstream joins should
  * carry `media_id` + features, not the payload. Partition sizing for
  * ~MB-scale payloads: lower `spark.sql.files.maxPartitionBytes` or
  * repartition by id so a partition's payload batch fits executor
  * memory.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, channels: Int)
  case class MediaRow(media_id: Long, modality: String,
                      payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String,
                           features: Array[Float])

  /** Deterministic codec stub — REPLACE with a real decoder at deploy.
    * Features are a fixed-dim fold of the payload bytes so tests can
    * assert exact values and partitioning behavior.
    */
  object Codec {
    def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    /** Frame-sampling stub: byte-ranges standing in for video frames. */
    def sampleFrames(payload: Array[Byte], every: Int): Seq[Array[Byte]] =
      payload.grouped(math.max(1, every)).toSeq

    /** Resize stub: deterministic nearest-neighbor subsample of the
      * payload to `outLen` bytes (stands in for image rescale; the
      * real codec swaps in here without touching the plan).
      */
    def resizeStub(payload: Array[Byte], outLen: Int): Array[Byte] = {
      if (payload.isEmpty || outLen <= 0) return Array.emptyByteArray
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) {
        out(i) = payload((i.toLong * payload.length / outLen).toInt)
        i += 1
      }
      out
    }
  }

  /** Payload resize as a partition-batched transform (same plumbing as
    * [[extractFeatures]]): map-only, metadata width/height refreshed.
    */
  def resize(media: Dataset[MediaRow], outLen: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => r.copy(
      payload = Codec.resizeStub(r.payload, outLen),
      meta = r.meta.copy(width = outLen, height = 1))))
  }

  /** Wrap a text corpus as fake media rows (fixture builder: payload =
    * UTF-8 bytes, metadata derived deterministically).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        lit(3).as("channels")).as("meta"))

  /** Feature extraction as a partition-batched typed transform: one
    * codec invocation per row, rows processed partition-at-a-time (the
    * JVM analog of a batched pandas UDF — same batch shape, no Python
    * round-trip). Map-only: no shuffle at any corpus size.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.media_id, r.modality,
        Codec.decodeStub(r.payload, dim)))
    }
  }

  case class FrameStats(media_id: Long, n_frames: Int,
                        first_bytes: Int, last_bytes: Int)

  /** Frame-sampling pass: runs [[Codec.sampleFrames]] per payload in a
    * partition-batched typed transform (the video-frame plumbing:
    * payload → bounded frame list → per-frame downstream work) and
    * reports per-media frame counts/sizes. Map-only; the stub's
    * byte-range "frames" make the stats arithmetic (ceil(len/every)),
    * hence oracle-checkable — a real demuxer swaps into sampleFrames
    * without touching the plan.
    */
  def frameStats(media: Dataset[MediaRow], every: Int): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val fs = Codec.sampleFrames(r.payload, every)
      if (fs.isEmpty) FrameStats(r.media_id, 0, 0, 0)
      else FrameStats(r.media_id, fs.length, fs.head.length, fs.last.length)
    })
  }

  /** Payload-level metadata pass (octet length + content digest) —
    * pure expressions over the binary column, no decode needed.
    */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("modality"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("digest"),
      col("meta.format").as("format"),
      col("meta.width").as("width"), col("meta.height").as("height"))
}
