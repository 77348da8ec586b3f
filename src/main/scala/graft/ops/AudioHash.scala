package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Real PCM audio decode + energy fingerprinting — the audio third of the
  * pixel-level multimodal path (images: [[ImageHash]], video containers:
  * [[VideoHeaders]]).
  *
  * A WAV payload's 16-bit PCM samples are decoded (independent RIFF walk
  * + LE sample read), the signal is cut into 65 equal windows, and the 64
  * adjacent-window energy comparisons become a 64-bit fingerprint in the
  * repo's standard 4x16-bit band shape — so the SAME banded pair
  * generator that serves image dHash ([[ImageHash.phashPairs]]) serves
  * audio near-dup unchanged, with the same exact-recall-at-hamming<=3
  * pigeonhole guarantee.
  *
  * All math is exact integers (abs-sum energies, cross-multiplied
  * comparisons), so the DuckDB oracle replays sample synthesis -> window
  * energies -> bits from the fixture formulas (`q_mm_audio_fp`): a hash
  * match proves the independent encode -> PCM decode -> fingerprint
  * chain, exactly like the GIF pixel gate.
  *
  * Scale shape: decode per-partition, rows carry 4 band ints + 2 stats;
  * the energy fingerprint is amplitude-scale-sensitive by design (it
  * compares energies, which a uniform gain shifts equally — comparisons
  * are gain-INVARIANT since both sides scale together).
  */
object AudioHash {

  case class AudioFp(
      doc_id: Long,
      n_samples: Long,
      abs_sum: Long,
      p0: Int, p1: Int, p2: Int, p3: Int)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode 16-bit mono PCM samples from a WAV payload: RIFF chunk walk
    * to `fmt ` (must be PCM, 1 channel, 16-bit) and `data`; samples read
    * little-endian signed. None for non-WAV / unsupported formats. */
  def pcmSamples(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var fmtOk = false
    var dataStart = -1
    var dataBytes = 0L
    var i = 12
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val sz = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length && sz >= 16) {
        fmtOk = le16(b, i + 8) == 1 && // PCM
          le16(b, i + 10) == 1 && // mono
          le16(b, i + 22) == 16 // 16-bit
      } else if (id == "data") {
        dataStart = i + 8
        dataBytes = sz
      }
      val next = i.toLong + 8L + sz + (sz & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (!fmtOk || dataStart < 0) return None
    val n = math.min(dataBytes, (b.length - dataStart).toLong).toInt / 2
    val s = new Array[Int](n)
    var k = 0
    while (k < n) {
      s(k) = le16(b, dataStart + 2 * k).toShort.toInt // sign-extend
      k += 1
    }
    Some(s)
  }

  /** 64-bit windowed-energy fingerprint: sample t belongs to window
    * t*65 div n (65 windows); window energy = exact abs-sum; bit w is set
    * when window w's mean energy < window w+1's (cross-multiplied integer
    * comparison). Returns (abs_sum, 4x16-bit bands); None when the signal
    * is too short for every window to be nonempty. */
  /** The 65-window abs-sum accumulation — the ONE definition both the
    * fingerprint and the silence segmentation consume (a drifted copy
    * would desynchronize q_mm_audio_fp from q_mm_silence, whose oracles
    * share the closed-form window preamble). Returns (e, c, total). */
  private def windowAccum(s: Array[Int]): (Array[Long], Array[Long], Long) = {
    val n = s.length
    val e = new Array[Long](65)
    val c = new Array[Long](65)
    var total = 0L
    var t = 0
    while (t < n) {
      val w = (t.toLong * 65 / n).toInt
      val a = math.abs(s(t)).toLong
      e(w) += a; c(w) += 1; total += a
      t += 1
    }
    (e, c, total)
  }

  def energyBands(s: Array[Int]): Option[(Long, (Int, Int, Int, Int))] = {
    val n = s.length
    if (n < 65) return None
    val (e, c, total) = windowAccum(s)
    val bands = new Array[Int](4)
    var w = 0
    while (w < 64) {
      if (e(w) * c(w + 1) < e(w + 1) * c(w)) bands(w / 16) |= 1 << (w % 16)
      w += 1
    }
    Some((total, (bands(0), bands(1), bands(2), bands(3))))
  }

  /** Per-payload audio fingerprints: decode + window inside the
    * partition; non-WAV (or too-short) payloads are dropped. The output
    * frame feeds [[ImageHash.phashPairs]] directly for near-dup pairs. */
  def fingerprint(spark: SparkSession, media: DataFrame): Dataset[AudioFp] = {
    import spark.implicits._
    media.as[Multimodal.MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        pcmSamples(r.payload).flatMap { s =>
          energyBands(s).map { case (total, (p0, p1, p2, p3)) =>
            AudioFp(r.doc_id, s.length.toLong, total, p0, p1, p2, p3)
          }
        }
      }
    }
  }

  /** One row per fingerprint window: (doc_id, w, e = Σ|s|, c = sample
    * count, n = track samples, total = Σ|s| over the track) — the raw
    * material segmentation/VAD-style passes consume. Same 65-window
    * split as [[energyBands]]; decode stays inside the partition, only
    * the 65 typed rows per track leave. */
  case class AudioWin(doc_id: Long, w: Int, e: Long, c: Long,
                      n: Long, total: Long)

  def windowEnergies(spark: SparkSession, media: DataFrame): Dataset[AudioWin] = {
    import spark.implicits._
    media.as[Multimodal.MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        pcmSamples(r.payload).iterator.flatMap { s =>
          val n = s.length
          if (n < 65) Iterator.empty
          else {
            val (e, c, total) = windowAccum(s)
            (0 until 65).iterator.map(w =>
              AudioWin(r.doc_id, w, e(w), c(w), n.toLong, total))
          }
        }
      }
    }
  }
}
