package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * Image dimension decode is REAL for PNG and JPEG (pure-JVM header
  * parsing, see [[ImageHeaders]] — no codec dependency). Payloads in
  * formats without a parser fall back to a deterministic md5-derived
  * pseudo-decode, which keeps the feature values oracle-reproducible on
  * the synthetic (text-byte) test corpus.
  *
  * At scale: payloads dominate row size, so feature extraction runs before
  * any wide shuffle, the codec (here the MessageDigest) is allocated once
  * per partition (not per row), and outputs drop the payload column so
  * downstream stages never shuffle raw media bytes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Real media ingestion: one row per file via Spark's `binaryFile`
    * source — (path, modificationTime, length, content). This is how
    * image/audio/video corpora actually enter the pipeline at scale;
    * doc_id is a stable hash of the file path (collision-checked by the
    * caller if ids must be dense), media_type from the extension, and
    * the payload feeds the same [[decodeFeatures]] partition shape the
    * synthetic corpus uses. The source prunes `content` when a query
    * only selects metadata columns, so listings stay cheap. */
  def readMedia(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // sign-bit mask, NOT abs(): abs(Long.MinValue) wraps negative in
        // non-ANSI mode, and downstream (media-type tagging, doc_id % 3
        // conventions) assumes non-negative ids
        xxhash64(col("path")).bitwiseAND(lit(Long.MaxValue)).as("doc_id"),
        col("path"),
        col("content").as("payload"),
        when(lower(col("path")).rlike("\\.(png|jpe?g|gif|bmp|webp)$"), "image")
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(lower(col("path")).rlike("\\.(mp4|mkv|webm|avi)$"), "video")
          .otherwise("binary").as("media_type"))

  /** Wrap a text table as fake media payloads (binary column + type tag). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  case class FrameFeature(
      doc_id: Long,
      frame_idx: Int,
      frame_checksum: String,
      brightness: Int)

  /** Frame sampling for video-typed payloads: emit `n_frames` rows per
    * video (uniform sampling is the real policy; the STUB codec derives a
    * deterministic per-frame checksum/feature from md5(payload || idx)).
    * The plumbing is the part that matters at scale: the explode happens
    * AFTER feature extraction inside the partition — one codec per
    * partition, payload bytes never duplicated per frame, and the output
    * rows carry only features, so the per-frame fan-out (x n_frames rows)
    * multiplies small rows, not media blobs. */
  def sampleFrames(spark: SparkSession, media: DataFrame): Dataset[FrameFeature] = {
    import spark.implicits._
    media.filter(col("media_type") === "video").as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.flatMap { r =>
        val n = (r.payload.length % 7 + 1).toInt
        (0 until n).iterator.map { i =>
          // ??? real frame decode goes here; stub hashes payload || idx
          val digest = md.digest(r.payload ++ i.toString.getBytes(StandardCharsets.UTF_8))
          md.reset()
          val hex = digest.map(b => f"${b & 0xff}%02x").mkString
          FrameFeature(r.doc_id, i, hex, Integer.parseInt(hex.substring(0, 2), 16))
        }
      }
    }
  }

  case class AudioFeatures(
      doc_id: Long,
      byte_len: Long,
      checksum: String,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_ms: Long)

  /** Audio feature decoder: REAL header parse for WAV/RIFF payloads
    * ([[AudioHeaders.wavInfo]] — sample rate / channels / bit depth /
    * sample count straight from the fmt and data chunks, no codec
    * dependency); other payloads get the deterministic md5-derived
    * stand-in (sample_rate in 8000..47999 so the duration arithmetic
    * never divides by zero), which is what the oracle-gated `q_mm_audio`
    * pins on the text-byte corpus. Same partition shape as
    * [[decodeFeatures]]: one digest per partition, payload dropped from
    * the output. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.filter(col("media_type") === "audio").as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map { r =>
        val digest = md.digest(r.payload)
        md.reset()
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val (rate, channels, bits, nSamples) =
          AudioHeaders.wavInfo(r.payload).getOrElse {
            val pseudoRate = 8000 + Integer.parseInt(hex.substring(4, 8), 16) % 40000
            val pseudoCh = Integer.parseInt(hex.substring(8, 9), 16) % 2 + 1
            val pseudoBits = 8 * (Integer.parseInt(hex.substring(9, 10), 16) % 2 + 1)
            (pseudoRate, pseudoCh, pseudoBits, r.payload.length.toLong)
          }
        AudioFeatures(
          doc_id = r.doc_id,
          byte_len = r.payload.length.toLong,
          checksum = hex,
          sample_rate = rate,
          channels = channels,
          bits_per_sample = bits,
          n_samples = nSamples,
          duration_ms = nSamples * 1000L / rate)
      }
    }
  }

  case class VideoFeatures(
      doc_id: Long,
      byte_len: Long,
      checksum: String,
      timescale: Int,
      duration_ticks: Long,
      duration_ms: Long)

  /** Video feature decoder: REAL container parse for MP4/ISO-BMFF
    * payloads ([[VideoHeaders.mp4Info]] — movie timescale and duration
    * straight from the moov/mvhd box, no codec dependency); other
    * payloads get the md5-derived stand-in (timescale in 600..90599 —
    * the conventional mvhd range — so the duration arithmetic never
    * divides by zero), which is what the oracle-gated `q_mm_video` pins
    * on the text-byte corpus. */
  def decodeVideo(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.filter(col("media_type") === "video").as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map { r =>
        val digest = md.digest(r.payload)
        md.reset()
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val (scale, ticks) = VideoHeaders.mp4Info(r.payload).getOrElse {
          (600 + Integer.parseInt(hex.substring(4, 8), 16) % 90000,
            r.payload.length.toLong)
        }
        VideoFeatures(
          doc_id = r.doc_id,
          byte_len = r.payload.length.toLong,
          checksum = hex,
          timescale = scale,
          duration_ticks = ticks,
          duration_ms = ticks * 1000L / scale)
      }
    }
  }

  /** Feature decoder. Dimensions come from a REAL header parse when the
    * payload is PNG or JPEG ([[ImageHeaders.dims]]); other formats fall
    * back to the deterministic md5-derived pseudo-decode (documented
    * stand-in for codecs this environment lacks — audio/video). The
    * partition iteration shape (one codec instance per partition,
    * streaming rows, payload dropped from the output) is the production
    * shape either way. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map { r =>
        val digest = md.digest(r.payload)
        md.reset()
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        val (width, height) = ImageHeaders.dims(r.payload).getOrElse(
          // non-image payload: deterministic checksum-derived stand-in
          (Integer.parseInt(hex.substring(0, 2), 16),
            Integer.parseInt(hex.substring(2, 4), 16)))
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          byte_len = r.payload.length.toLong,
          checksum = hex,
          width = width,
          height = height,
          n_frames = (r.payload.length % 7 + 1).toInt)
      }
    }
  }
}

/** Pure-JVM image header decoding — dimension fields live at fixed or
  * walkable offsets, so no codec library is needed to read them.
  *
  * Formats:
  *  - PNG: 8-byte signature, then the IHDR chunk (the spec requires it
  *    first): 4-byte big-endian length, ASCII "IHDR", 4-byte BE width,
  *    4-byte BE height.
  *  - JPEG: SOI marker FF D8, then a marker-segment walk (2-byte BE
  *    lengths including themselves) to the first SOF frame header
  *    (C0-CF minus C4/C8/CC), which carries precision(1), height(2 BE),
  *    width(2 BE).
  */
object ImageHeaders {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** (width, height) from a PNG IHDR, or None if not a (plausible) PNG. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 24 ||
        (0 until 8).exists(i => (b(i) & 0xff) != PngSig(i)) ||
        b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      None
    else {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    }

  /** (width, height) from the first JPEG SOF marker, or None. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      marker match {
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOF: len(2) precision(1) height(2) width(2)
          if (j + 7 >= b.length) return None
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          return if (w > 0 && h > 0) Some((w, h)) else None
        case 0xd9 | 0xda => return None // EOI / start of scan: no SOF seen
        case m if (m >= 0xd0 && m <= 0xd7) || m == 0x01 =>
          i = j + 1 // standalone marker, no length field
        case _ =>
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1)
          if (len < 2) return None
          i = j + 1 + len
      }
    }
    None
  }

  /** First successful header parse across supported formats. */
  def dims(b: Array[Byte]): Option[(Int, Int)] =
    pngDims(b).orElse(jpegDims(b))
}

/** Pure-JVM WAV (RIFF) header decoding: "RIFF" + size + "WAVE", then a
  * chunk walk (4-byte id, 4-byte little-endian size, payload padded to
  * even length). The "fmt " chunk carries format(2 LE), channels(2 LE),
  * sample_rate(4 LE), byte_rate(4), block_align(2 LE),
  * bits_per_sample(2 LE); the "data" chunk size divided by block_align
  * gives the sample count. */
object AudioHeaders {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** (sample_rate, channels, bits_per_sample, n_samples) from a WAV
    * payload, or None if it isn't one (or the fmt/data chunks are
    * missing/truncated/inconsistent). */
  def wavInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val sz = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length && sz >= 16) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        // size may legitimately exceed what we were handed (truncated
        // fetch); the header value is still the authoritative length
        dataBytes = sz
      }
      // chunks pad to even offsets; clamp in Long so a huge/corrupt size
      // can't overflow Int and loop forever
      val next = i.toLong + 8L + sz + (sz & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (rate > 0 && channels > 0 && blockAlign > 0 && dataBytes >= 0)
      Some((rate, channels, bits, dataBytes / blockAlign))
    else None
  }
}

/** Pure-JVM MP4 (ISO base media) header decoding: top-level box walk
  * ([size:4 BE][type:4 ASCII]; size 1 = 64-bit largesize follows, size 0
  * = to end of file) to the `moov` box, then its children to `mvhd`
  * (a FullBox: version+flags, then — v0 — ctime(4) mtime(4) timescale(4)
  * duration(4), or — v1 — 8/8/4/8). */
object VideoHeaders {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk sibling boxes in [from, until) for `boxType`; returns the
    * payload offset and end, or None. */
  private def findBox(b: Array[Byte], from: Int, until: Int,
                      boxType: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= until) {
      val size0 = be32(b, i)
      val tpe = tag(b, i + 4)
      val (payload, size) =
        if (size0 == 1L && i + 16 <= until) (i + 16, be64(b, i + 8))
        else if (size0 == 0L) (i + 8, (until - i).toLong)
        else (i + 8, size0)
      if (size < 8 || i.toLong + size > until) return None // corrupt size
      if (tpe == boxType) return Some((payload, (i + size).toInt))
      i = (i + size).toInt
    }
    None
  }

  /** (timescale, duration_ticks) from the moov/mvhd box, or None. */
  def mp4Info(b: Array[Byte]): Option[(Int, Long)] = {
    // sanity: a real MP4 starts with a box whose type is printable ASCII
    // (conventionally ftyp); random text bytes fail the size walk below
    for {
      (moovStart, moovEnd) <- findBox(b, 0, b.length, "moov")
      (mvhd, _) <- findBox(b, moovStart, moovEnd, "mvhd")
      if mvhd + 4 <= b.length
      version = b(mvhd) & 0xff
      info <- version match {
        case 0 if mvhd + 20 <= b.length =>
          Some((be32(b, mvhd + 12).toInt, be32(b, mvhd + 16)))
        case 1 if mvhd + 32 <= b.length =>
          Some((be32(b, mvhd + 20).toInt, be64(b, mvhd + 24)))
        case _ => None
      }
      if info._1 > 0 && info._2 >= 0
    } yield info
  }
}
