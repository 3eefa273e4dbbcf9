package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads
  * travel as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extraction runs as partition-batched transforms.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * lineage — is real and tested. The IMAGE codec is real too:
  * [[Codec.decodeImage]] decodes JPEG/PNG/GIF/BMP through the JDK's
  * `javax.imageio` (zero added dependencies) to true pixel dimensions
  * and luminance features. [[Codec.decodeStub]] remains the
  * deterministic hermetic fallback for unreadable payloads and for
  * audio/video modalities this container has no libraries for;
  * swapping in a real demuxer there changes ONE function and nothing
  * about the distributed plan.
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

  /** Codec layer. [[decodeImage]] is a REAL image decode (JDK
    * `javax.imageio` — zero added dependencies): JPEG/PNG/GIF/BMP
    * payloads decode to true pixel dimensions and a luminance fold.
    * [[decodeStub]] stays as the deterministic hermetic fallback for
    * payloads ImageIO cannot read (text-byte fixtures, truncated
    * files) and for audio/video modalities this container has no
    * libraries for. Features from the stub are a fixed-dim fold of
    * the payload bytes so tests can assert exact values and
    * partitioning behavior.
    */
  object Codec {

    // ImageIO's default decode path spills through a disk-backed
    // stream cache — per-row file churn in the executor hot loop;
    // in-memory only
    javax.imageio.ImageIO.setUseCache(false)

    /** Content sniff from magic bytes (the metadata struct states a
      * CLAIM; the payload is the truth).
      */
    def sniffFormat(p: Array[Byte]): String =
      if (p.length >= 4 && (p(0) & 0xFF) == 0x89 &&
        p(1) == 'P'.toByte && p(2) == 'N'.toByte && p(3) == 'G'.toByte)
        "image/png"
      else if (p.length >= 3 && (p(0) & 0xFF) == 0xFF &&
        (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF) "image/jpeg"
      else if (p.length >= 4 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == '8'.toByte) "image/gif"
      else if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte)
        "image/bmp"
      else "unknown"

    /** Real image decode: true width/height/channels plus a `dim`-fold
      * of per-pixel luminance ((r+g+b)/3·255), row-major — pixel i
      * accumulates into feature i % dim, so with dim ≥ pixels the
      * vector IS the luminance raster. None when ImageIO cannot read
      * the payload (caller decides the fallback).
      */
    def decodeImage(payload: Array[Byte], dim: Int): Option[(MediaMeta, Array[Float])] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Float](dim)
          var y = 0
          var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(i % dim) += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                (rgb & 0xFF)) / 765.0f // 3 · 255
              i += 1
              x += 1
            }
            y += 1
          }
          Some((MediaMeta(sniffFormat(payload), w, h,
            img.getColorModel.getNumComponents), out))
        }
      } catch { case _: Exception => None }

    /** PNG fixture encoder (lossless, so decode recovers exact pixel
      * values): `pixel(x, y)` returns packed 0xRRGGBB.
      */
    def encodePng(width: Int, height: Int,
                  pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    case class AudioInfo(sampleRate: Int, channels: Int, nSamples: Long,
                         rms: Double, peak: Int)

    /** Real audio decode: 16-bit signed PCM WAV through the JDK's
      * `javax.sound.sampled` (zero added dependencies — the same
      * pattern that made the image path real). Reports the container's
      * true sample rate / channel count and two sample-domain
      * features: RMS amplitude and absolute peak. None when the
      * payload isn't a parseable 16-bit PCM stream (caller decides the
      * fallback, mirroring [[decodeImage]]'s contract).
      */
    def decodeAudio(payload: Array[Byte]): Option[AudioInfo] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var i = 0
          var sumSq = 0.0
          var peak = 0
          while (i < n) {
            val (lo, hi) =
              if (fmt.isBigEndian) (bytes(2 * i + 1), bytes(2 * i))
              else (bytes(2 * i), bytes(2 * i + 1))
            val s = ((hi.toInt << 8) | (lo & 0xFF)).toShort.toInt
            sumSq += s.toDouble * s
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels, n,
            if (n == 0) 0.0 else math.sqrt(sumSq / n), peak))
        }
      } catch { case _: Exception => None }

    /** WAV fixture encoder: 16-bit PCM mono, little-endian — the
      * canonical 44-byte RIFF layout, so [[decodeAudio]] recovers the
      * exact samples (PCM is lossless).
      */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)            // PCM
        .putShort(1)            // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

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

    // ---- GVID: a minimal length-prefixed frame container ----
    //
    // This container has no compressed-video codec in the sandbox to
    // stand behind it, so the wire format is OURS and documented:
    //   "GVID" | int32 frameCount | { int32 len | len bytes } × count
    // (big-endian ints). What it buys: the DEMUX path — container
    // validation, bounded frame iteration, per-frame handoff to the
    // REAL image codec — is real executable code with real failure
    // modes (truncated payloads, lying headers), which is the part of
    // video handling a Spark pipeline owns; swapping an MP4 demuxer
    // in changes these two functions and nothing downstream.

    def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(
        8 + frames.map(_.length + 4).sum)
      bb.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }

    /** Real demux: validates the magic + every frame's length prefix
      * against the payload's actual extent. None for non-GVID or
      * truncated payloads (caller decides the fallback, mirroring
      * [[decodeImage]]).
      */
    def demuxFrames(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
      try {
        if (payload.length < 8 ||
          new String(payload, 0, 4, "US-ASCII") != "GVID") None
        else {
          val bb = java.nio.ByteBuffer.wrap(payload, 4, payload.length - 4)
          val n = bb.getInt()
          if (n < 0) None
          else {
            val out = Seq.newBuilder[Array[Byte]]
            var i = 0
            var ok = true
            while (ok && i < n) {
              if (bb.remaining() < 4) ok = false
              else {
                val len = bb.getInt()
                if (len < 0 || bb.remaining() < len) ok = false
                else {
                  val f = new Array[Byte](len)
                  bb.get(f)
                  out += f
                  i += 1
                }
              }
            }
            if (ok) Some(out.result()) else None
          }
        }
      } catch { case _: Exception => None }

    /** Real image resize: ImageIO decode → nearest-neighbor rescale
      * on a Graphics2D canvas → lossless PNG re-encode (so a solid
      * color survives bit-exactly and fixture pixels stay checkable).
      * None when the payload isn't a decodable image — the caller
      * falls back to the byte-subsample stub, mirroring
      * [[decodeImage]]'s contract.
      */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }

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

  /** REAL image resize as the same partition-batched transform:
    * decodable payloads come back as (w × h) lossless PNGs with
    * metadata reflecting pixel truth; undecodable ones degrade to the
    * deterministic byte-subsample stub with format "unknown" — the
    * same graceful-degradation contract as [[decodeFeatures]].
    */
  def resizeMedia(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codec.resizeImage(r.payload, w, h) match {
        case Some(png) => r.copy(payload = png,
          meta = MediaMeta("image/png", w, h, 3))
        case None => r.copy(payload = Codec.resizeStub(r.payload, w * h),
          meta = MediaMeta("unknown", w, h, r.meta.channels))
      }
    })
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

  case class DecodedMedia(media_id: Long, modality: String,
                          decoded: Boolean, format: String, width: Int,
                          height: Int, channels: Int,
                          features: Array[Float])

  /** Feature extraction with the REAL image decode: payloads ImageIO
    * can read yield true pixel dimensions + luminance features
    * (`decoded = true`, metadata refreshed from the pixels); anything
    * else falls back to [[Codec.decodeStub]] with the metadata
    * struct's claims passed through (`decoded = false`) — one bad
    * file degrades, it does not fail the job. Same
    * partition-at-a-time map-only plumbing as [[extractFeatures]]:
    * no shuffle at any corpus size.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codec.decodeImage(r.payload, dim) match {
        case Some((m, f)) => DecodedMedia(r.media_id, r.modality,
          decoded = true, m.format, m.width, m.height, m.channels, f)
        case None => DecodedMedia(r.media_id, r.modality,
          decoded = false, r.meta.format, r.meta.width, r.meta.height,
          r.meta.channels, Codec.decodeStub(r.payload, dim))
      }
    })
  }

  case class AudioStats(media_id: Long, decoded: Boolean,
                        sample_rate: Int, channels: Int, n_samples: Long,
                        rms: Double, peak: Int)

  /** Audio feature pass with the REAL WAV decode: parseable 16-bit
    * PCM payloads report container-truth sample rate / channels and
    * sample-domain RMS + peak (`decoded = true`); anything else
    * degrades to a deterministic byte-level stub (`decoded = false`,
    * metadata claims passed through) — one bad file degrades, it does
    * not fail the job. Same partition-batched map-only plumbing as
    * [[decodeFeatures]]: no shuffle at any corpus size.
    */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codec.decodeAudio(r.payload) match {
        case Some(a) => AudioStats(r.media_id, decoded = true,
          a.sampleRate, a.channels, a.nSamples, a.rms, a.peak)
        case None => AudioStats(r.media_id, decoded = false,
          0, r.meta.channels, r.payload.length.toLong, 0.0, 0)
      }
    })
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

  case class VideoStats(media_id: Long, decoded: Boolean, n_frames: Int,
                        frame_w: Int, frame_h: Int, first_lum: Double,
                        last_lum: Double)

  /** Video feature pass with the REAL demux + per-frame image decode:
    * GVID payloads ([[Codec.demuxFrames]]) report their true frame
    * count, the first frame's pixel dimensions, and first/last-frame
    * mean luminance through the same `javax.imageio` codec the image
    * path uses (`decoded = true`); non-GVID or truncated payloads —
    * and frames ImageIO can't read — degrade to the deterministic
    * byte-level stub (`decoded = false`). Map-only partition-batched
    * plumbing, as everywhere in this layer.
    */
  def videoStats(media: Dataset[MediaRow]): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    def lum(frame: Array[Byte]): Option[(Int, Int, Double)] =
      Codec.decodeImage(frame, 1).map { case (m, f) =>
        (m.width, m.height, f(0).toDouble / (m.width * m.height))
      }
    media.mapPartitions(_.map { r =>
      Codec.demuxFrames(r.payload).flatMap { fs =>
        if (fs.isEmpty) Some(VideoStats(r.media_id, decoded = true,
          0, 0, 0, 0.0, 0.0))
        else for (a <- lum(fs.head); z <- lum(fs.last))
          yield VideoStats(r.media_id, decoded = true, fs.length,
            a._1, a._2, a._3, z._3)
      }.getOrElse(VideoStats(r.media_id, decoded = false,
        0, 0, 0, 0.0, 0.0))
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
