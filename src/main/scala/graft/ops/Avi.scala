package graft.ops

import java.nio.charset.StandardCharsets

/** Pure-JVM AVI (RIFF) container decoding — the real-video-frame path the
  * MP4 stand-in lacks: MJPEG-in-AVI and uncompressed 8-bit rasters are
  * both fully walkable without a codec library, so per-frame DATA (not
  * just container metadata) is decoded end to end.
  *
  * Layout (public RIFF/AVI spec): "RIFF" + size(LE32) + "AVI ", then a
  * chunk walk — [id:4][size:LE32][payload][pad-to-even]. A "LIST" chunk
  * carries a 4-byte subtype then child chunks:
  *  - LIST "hdrl" holds the "avih" main header (us_per_frame at +0,
  *    total_frames at +16, width at +32, height at +36 — all LE32);
  *  - LIST "movi" holds the frame chunks, ids "NNcc" where NN is the
  *    2-digit stream number and cc the code type: "dc" = compressed video
  *    (MJPEG here: each payload is a complete JPEG), "db" = uncompressed
  *    DIB (here: width x height 8-bit luma rows).
  * "JUNK" padding and the optional "idx1" index are skipped like any
  * unrecognized chunk. Sizes are authoritative; odd sizes pad one byte.
  */
object AviHeaders {

  /** One movi frame: stream number, code type ("dc" | "db"), and the
    * [start, end) payload byte range. */
  case class AviFrame(stream: Int, codeType: String, dataStart: Int, dataEnd: Int)

  case class AviInfo(usPerFrame: Long, totalFrames: Long,
                     width: Int, height: Int, frames: Vector[AviFrame])

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      StandardCharsets.US_ASCII)

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Full container walk, or None if the payload is not a (plausible)
    * AVI. Truncated/corrupt sizes abort the parse rather than mis-frame. */
  def aviInfo(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None
    var usPerFrame = -1L; var totalFrames = -1L
    var width = -1; var height = -1
    var frames = Vector.empty[AviFrame]
    // walk children of [from, until); returns false on a corrupt size
    def walk(from: Int, until: Int, inMovi: Boolean, inHdrl: Boolean): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val id = tag(b, i)
        val sz = le32(b, i + 4)
        val start = i + 8
        val end = start.toLong + sz
        if (sz < 0 || end > until) return false
        id match {
          case "LIST" if sz >= 4 =>
            val sub = tag(b, start)
            // a movi-nested "rec " group holds frames like movi itself
            if (!walk(start + 4, end.toInt,
                inMovi || sub == "movi" || (inMovi && sub == "rec "),
                inHdrl || sub == "hdrl")) return false
          case "avih" if inHdrl && sz >= 40 =>
            usPerFrame = le32(b, start)
            totalFrames = le32(b, start + 16)
            width = le32(b, start + 32).toInt
            height = le32(b, start + 36).toInt
          case fid if inMovi && fid.length == 4 &&
              isDigit(fid(0)) && isDigit(fid(1)) &&
              (fid.substring(2) == "dc" || fid.substring(2) == "db" ||
                fid.substring(2) == "wb") =>
            frames :+= AviFrame((fid(0) - '0') * 10 + (fid(1) - '0'),
              fid.substring(2), start, end.toInt)
          case _ => () // JUNK, idx1, strl/strh/strf, anything else: skip
        }
        i = (end + (sz & 1L)).toInt // chunks pad to even offsets
      }
      true
    }
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    if (!walk(12, riffEnd, inMovi = false, inHdrl = false)) return None
    if (usPerFrame < 0 || width <= 0 || height <= 0) return None
    Some(AviInfo(usPerFrame, totalFrames, width, height, frames))
  }

  /** Unsigned byte sum over [from, until) — the exact luma sum of an
    * 8-bit raster frame. */
  def byteSum(b: Array[Byte], from: Int, until: Int): Long = {
    var s = 0L
    var i = from
    while (i < until) { s += (b(i) & 0xff); i += 1 }
    s
  }
}

/** Deterministic AVI fixture encoder — the encoding side of the
  * `q_mm_video_frames` oracle gate (the video mirror of
  * [[GifPixelFixtures]]/[[AudioFixtures]]). Every container field and
  * every frame byte is a pure integer function of `docId`, so the DuckDB
  * oracle predicts frame geometry, byte counts, and raw-frame luma sums
  * without reading a byte; [[AviHeaders]] shares no code with this
  * writer. Frames alternate codecs — even index: a complete MJPEG frame
  * (real JPEG bytes, per-frame SOF dimensions the decoder must re-parse),
  * odd index: an uncompressed 8-bit luma raster (real pixel data whose
  * exact sum the decoder must re-compute). The stream also exercises JUNK
  * padding (docId % 3 == 0), an idx1 index (docId % 2 == 0), odd-size
  * chunk padding (odd-length JPEG payloads), and a strl header list. */
private[graft] object AviFixtures {

  def nFrames(docId: Long): Int = (docId % 4).toInt + 2
  def usPerFrame(docId: Long): Long = 33333L + docId % 1000
  def width(docId: Long): Int = 16 * ((docId % 5).toInt + 1)
  def height(docId: Long): Int = 8 * ((docId % 7).toInt + 1)

  /** MJPEG frame i's SOF dimensions (differ from the container's, so a
    * hash match proves PER-FRAME parsing, not avih echo). */
  def jpegW(docId: Long, i: Int): Int = width(docId) + i
  def jpegH(docId: Long, i: Int): Int = height(docId) + 2 * i
  /** Scan-segment byte count of MJPEG frame i (5..15 — odd counts force
    * the chunk-padding path). */
  def scanLen(docId: Long, i: Int): Int = 5 + ((docId + 3 * i) % 11).toInt
  /** Total MJPEG frame bytes: SOI(2) + SOF0(2+17) + SOS(2+12) + scan + EOI(2). */
  def jpegBytes(docId: Long, i: Int): Int = 37 + scanLen(docId, i)
  /** Raw frame pixel (x, y) of frame i — 8-bit luma. */
  def pixel(docId: Long, i: Int, x: Int, y: Int): Int =
    ((docId + 3 * x + 7 * y + 11 * i) % 256).toInt

  private def jpegFrame(docId: Long, i: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u8(0xff); u8(0xd8) // SOI
    u8(0xff); u8(0xc0); be16(17) // SOF0, len
    u8(8); be16(jpegH(docId, i)); be16(jpegW(docId, i)); u8(3)
    (1 to 3).foreach { c => u8(c); u8(0x11); u8(0) }
    u8(0xff); u8(0xda); be16(12) // SOS, len
    u8(3); (1 to 3).foreach { c => u8(c); u8(0) }
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    // entropy bytes: % 251 keeps every value < 0xFF, so no marker
    // ambiguity and no byte stuffing needed
    (0 until scanLen(docId, i)).foreach(k => u8(((docId + 5 * k + i) % 251).toInt))
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }

  private def rawFrame(docId: Long, i: Int): Array[Byte] = {
    val w = width(docId); val h = height(docId)
    val px = new Array[Byte](w * h)
    var y = 0; var p = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(p) = pixel(docId, i, x, y).toByte; p += 1; x += 1 }
      y += 1
    }
    px
  }

  def synthAvi(docId: Long): Array[Byte] =
    container(docId, (0 until nFrames(docId)).map { i =>
      if (i % 2 == 0) ("00dc", jpegFrame(docId, i))
      else ("00db", rawFrame(docId, i))
    })

  /** Frame JPEG seed for the pixel-level MJPEG family: each frame of a
    * container is an INDEPENDENT block-constant baseline JPEG
    * ([[JpegFixtures.synthJpeg]]) with its own geometry/content. */
  def pxSeed(docId: Long, i: Int): Long = docId * 7 + i

  /** MJPEG AVI whose every 00dc frame is a REAL decodable JPEG — the
    * per-frame PIXEL decode fixture (the dims-only family above keeps
    * its original oracle). */
  def synthMjpegPxAvi(docId: Long): Array[Byte] =
    container(docId, (0 until nFrames(docId)).map { i =>
      ("00dc", JpegFixtures.synthJpeg(pxSeed(docId, i)))
    })

  /** Audio-track fixture formulas: one 256-sample 16-bit PCM chunk per
    * video frame, samples a pure integer function of (docId, t). */
  val AudioChunkSamples = 256
  def aviSample(docId: Long, t: Int): Int =
    (((docId * 31 + 7L * t + (t.toLong * t) % 101) % 4001) - 2000).toInt

  private def audioChunk(docId: Long, chunkIdx: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var k = 0
    while (k < AudioChunkSamples) {
      val s = aviSample(docId, chunkIdx * AudioChunkSamples + k)
      out.write(s & 0xff); out.write((s >> 8) & 0xff)
      k += 1
    }
    out.toByteArray
  }

  /** Audio+video AVI: 00dc JPEG frames INTERLEAVED with 01wb PCM audio
    * chunks, the way real muxers lay out a movi list. The audio track is
    * the concatenation of the 01wb payloads in walk order. */
  def synthAvAvi(docId: Long): Array[Byte] =
    container(docId, (0 until nFrames(docId)).flatMap { i =>
      Seq(("00dc", JpegFixtures.synthJpeg(pxSeed(docId, i))),
        ("01wb", audioChunk(docId, i)))
    })

  private def container(docId: Long, frames: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def tag4(s: String): Unit = out.write(s.getBytes(StandardCharsets.US_ASCII))
    val n = frames.length
    val hasIdx = docId % 2 == 0

    // avih main header: 56 bytes
    val avih = new java.io.ByteArrayOutputStream()
    def a32(v: Long): Unit = { avih.write(v.toInt & 0xff); avih.write((v >> 8).toInt & 0xff); avih.write((v >> 16).toInt & 0xff); avih.write((v >> 24).toInt & 0xff) }
    a32(usPerFrame(docId)); a32(0); a32(0); a32(if (hasIdx) 0x10 else 0)
    a32(n.toLong); a32(0); a32(1); a32(0)
    a32(width(docId).toLong); a32(height(docId).toLong)
    (0 until 4).foreach(_ => a32(0))

    // strl: stream header + BITMAPINFOHEADER format (walked over, not read)
    val strh = new java.io.ByteArrayOutputStream()
    def s32(v: Long): Unit = { strh.write(v.toInt & 0xff); strh.write((v >> 8).toInt & 0xff); strh.write((v >> 16).toInt & 0xff); strh.write((v >> 24).toInt & 0xff) }
    strh.write("vids".getBytes(StandardCharsets.US_ASCII))
    strh.write("MJPG".getBytes(StandardCharsets.US_ASCII))
    s32(0); s32(0); s32(0); s32(usPerFrame(docId)); s32(1000000L)
    s32(0); s32(n.toLong); s32(0); s32(-1L); s32(0); s32(0); s32(0)
    val strf = new java.io.ByteArrayOutputStream()
    def f32(v: Long): Unit = { strf.write(v.toInt & 0xff); strf.write((v >> 8).toInt & 0xff); strf.write((v >> 16).toInt & 0xff); strf.write((v >> 24).toInt & 0xff) }
    f32(40); f32(width(docId).toLong); f32(height(docId).toLong)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0) // planes, bpp
    f32(0); f32(0); f32(0); f32(0); f32(0); f32(0)

    def list(sub: String, body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(sub.getBytes(StandardCharsets.US_ASCII))
      body(o)
      o.toByteArray
    }
    def innerChunk(o: java.io.ByteArrayOutputStream, id: String, payload: Array[Byte]): Unit = {
      o.write(id.getBytes(StandardCharsets.US_ASCII))
      val len = payload.length
      o.write(len & 0xff); o.write((len >> 8) & 0xff); o.write((len >> 16) & 0xff); o.write((len >> 24) & 0xff)
      o.write(payload)
      if ((len & 1) == 1) o.write(0)
    }

    val strlBody = list("strl", o => {
      innerChunk(o, "strh", strh.toByteArray)
      innerChunk(o, "strf", strf.toByteArray)
    })
    val hdrlBody = list("hdrl", o => {
      innerChunk(o, "avih", avih.toByteArray)
      innerChunk(o, "LIST", strlBody) // nested LIST: id + size + "strl" + children
    })
    val moviBody = list("movi", o => frames.foreach { case (id, p) => innerChunk(o, id, p) })

    // assemble the RIFF body first so the outer size is exact
    val body = new java.io.ByteArrayOutputStream()
    body.write("AVI ".getBytes(StandardCharsets.US_ASCII))
    innerChunk(body, "LIST", hdrlBody)
    if (docId % 3 == 0) // JUNK alignment padding, as real muxers emit
      innerChunk(body, "JUNK", new Array[Byte](((docId % 5) + 2).toInt))
    innerChunk(body, "LIST", moviBody)
    if (hasIdx) { // idx1: 16-byte entries; skipped by the reader
      val idx = new java.io.ByteArrayOutputStream()
      var off = 4L
      frames.foreach { case (id, p) =>
        idx.write(id.getBytes(StandardCharsets.US_ASCII))
        def i32(v: Long): Unit = { idx.write(v.toInt & 0xff); idx.write((v >> 8).toInt & 0xff); idx.write((v >> 16).toInt & 0xff); idx.write((v >> 24).toInt & 0xff) }
        i32(0x10L); i32(off); i32(p.length.toLong)
        off += 8L + p.length + (p.length & 1)
      }
      innerChunk(body, "idx1", idx.toByteArray)
    }
    val bodyBytes = body.toByteArray
    tag4("RIFF"); u32(bodyBytes.length.toLong); out.write(bodyBytes)
    out.toByteArray
  }
}
