package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): it derives deterministic pseudo-features from the payload
  * bytes (md5-based), so the Spark-side plumbing — binary schema, typed
  * Dataset, mapPartitions batch shape, per-partition codec reuse — is real
  * and testable, and the feature values stay oracle-reproducible.
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

  /** STUB decoder: deterministic pseudo-decode of a payload. A real
    * implementation would invoke an image/audio codec here; the partition
    * iteration shape (one codec instance per partition, streaming rows)
    * is exactly what the real thing needs. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map { r =>
        val digest = md.digest(r.payload)
        md.reset()
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        // ??? real decode goes here; stub derives dims from the checksum
        val width = Integer.parseInt(hex.substring(0, 2), 16)
        val height = Integer.parseInt(hex.substring(2, 4), 16)
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
