package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Real PNG pixel decoding — chunk walk with CRC verification, zlib
  * inflate (`java.util.zip.Inflater`, the JVM's standard zlib), and full
  * scanline un-filtering (all five PNG filter types: None/Sub/Up/
  * Average/Paeth) for 8-bit grayscale / truecolor / truecolor+alpha.
  * Completes the real-decode set next to GIF's LZW ([[GifLzw]]), WAV's
  * PCM ([[AudioHash]]) and MJPEG/raw AVI ([[AviHeaders]]); PNG payloads
  * previously took the md5 stand-in path.
  *
  * Scope: bit depth 8, color types 0/2/6, non-interlaced (Adam7 stays
  * out of scope the way H.264 does for video — documented, not stubbed).
  * Malformed data (bad signature, CRC mismatch, short inflate, wrong
  * IHDR) returns None rather than throwing: decode runs per-partition
  * over untrusted corpus bytes.
  *
  * Scale shape: identical to the GIF path — decode inside
  * `mapPartitions`, pixels never leave the partition, emitted rows carry
  * geometry + luma stats + the four dHash bands only.
  */
object Png {

  case class PngImage(width: Int, height: Int, colorType: Int,
                      gray: Array[Int])

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def bytesPerPixel(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case _ => -1
  }

  /** ITU-R 601 integer luma — the same rounding as [[ImageHash.luma]]. */
  private def luma(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG payload to a luma plane, or None on anything
    * malformed or outside the supported subset. */
  def decode(b: Array[Byte]): Option[PngImage] = {
    if (b.length < 8 + 25 || !b.take(8).sameElements(Signature)) return None
    var off = 8
    var width = 0; var height = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= b.length && !sawIend) {
      val len = be32(b, off)
      if (len < 0 || off + 12 + len > b.length) return None
      val ctype = new String(b, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, off + 8 + len)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(b, off + 8); height = be32(b, off + 12)
          val bitDepth = b(off + 16) & 0xff
          colorType = b(off + 17) & 0xff
          val (comp, filt, inter) =
            (b(off + 18) & 0xff, b(off + 19) & 0xff, b(off + 20) & 0xff)
          if (width <= 0 || height <= 0 || bitDepth != 8 ||
            bytesPerPixel(colorType) < 0 || comp != 0 || filt != 0 ||
            inter != 0) return None
          sawIhdr = true
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len
    }
    if (!sawIhdr || !sawIend) return None
    val bpp = bytesPerPixel(colorType)
    val stride = width * bpp
    val expected = height * (1 + stride)
    val raw = new Array[Byte](expected)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(raw, got, expected - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != expected) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // un-filter in place into a recon plane, then collapse to luma
    val recon = new Array[Int](height * stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      val rowOff = y * (1 + stride) + 1
      var x = 0
      while (x < stride) {
        val rx = raw(rowOff + x) & 0xff
        val a = if (x >= bpp) recon(y * stride + x - bpp) else 0
        val b2 = if (y > 0) recon((y - 1) * stride + x) else 0
        val c = if (x >= bpp && y > 0) recon((y - 1) * stride + x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b2
          case 3 => (a + b2) / 2
          case 4 => paeth(a, b2, c)
        }
        recon(y * stride + x) = (rx + pred) & 0xff
        x += 1
      }
      y += 1
    }
    val gray = new Array[Int](width * height)
    var i = 0
    while (i < gray.length) {
      val o = i * bpp
      gray(i) =
        if (colorType == 0) recon(o)
        else luma(recon(o), recon(o + 1), recon(o + 2)) // alpha ignored
      i += 1
    }
    Some(PngImage(width, height, colorType, gray))
  }

  case class PngRecord(
      doc_id: Long, width: Int, height: Int, color_type: Int,
      n_pixels: Long, gray_sum: Long, p0: Int, p1: Int, p2: Int, p3: Int)

  /** Decode + dHash per PNG payload inside the partition — the PNG twin
    * of [[ImageHash.phash]]; non-PNG / malformed payloads are dropped. */
  def phash(spark: SparkSession, media: DataFrame): Dataset[PngRecord] = {
    import spark.implicits._
    media.as[Multimodal.MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        decode(r.payload).map { img =>
          val gi = ImageHash.GrayImage(img.width, img.height, img.gray)
          val (p0, p1, p2, p3) = ImageHash.dhash(gi)
          PngRecord(r.doc_id, img.width, img.height, img.colorType,
            img.gray.length.toLong, img.gray.map(_.toLong).sum,
            p0, p1, p2, p3)
        }
      }
    }
  }
}

/** Independent PNG ENCODER for fixtures — writes the filtered scanlines
  * and zlib stream itself (Deflater is zlib's compressor; the decoder
  * exercises the inflate direction), with pixels given by pure integer
  * formulas of (doc_id, x, y) that the SQL oracle replays without
  * parsing a byte. The per-row filter type cycles y % 5, so every
  * fixture exercises ALL FIVE filter predictors; color type cycles
  * gray / RGB / RGBA by doc_id % 3. */
object PngFixtures {

  def colorType(id: Long): Int = Array(0, 2, 6)((id % 3).toInt)
  def width(id: Long): Int = 17 + (id % 16).toInt
  def height(id: Long): Int = 14 + (id % 13).toInt

  /** Channel formulas (the oracle mirrors these exactly). */
  def grayV(id: Long, x: Int, y: Int): Int =
    ((7 * id + 3 * x + 11 * y + x.toLong * y) % 256).toInt
  def red(id: Long, x: Int, y: Int): Int = ((id + 5 * x + 2 * y) % 256).toInt
  def green(id: Long, x: Int, y: Int): Int = ((3 * id + x + 7 * y) % 256).toInt
  def blue(id: Long, x: Int, y: Int): Int = ((id + x.toLong * y) % 256).toInt
  def alpha(x: Int, y: Int): Int = (x + y) % 256

  /** Expected decoded luma (what [[Png.decode]] must reproduce). */
  def expectedLuma(id: Long, x: Int, y: Int): Int = colorType(id) match {
    case 0 => grayV(id, x, y)
    case _ => (299 * red(id, x, y) + 587 * green(id, x, y) +
      114 * blue(id, x, y)) / 1000
  }

  private def chunk(out: java.io.ByteArrayOutputStream, ctype: String,
                    data: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length))
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def synthPng(id: Long): Array[Byte] = {
    val ct = colorType(id); val w = width(id); val h = height(id)
    val bpp = ct match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    // raw pixel plane from the formulas
    val recon = new Array[Int](h * stride)
    for (y <- 0 until h; x <- 0 until w) {
      val o = y * stride + x * bpp
      ct match {
        case 0 => recon(o) = grayV(id, x, y)
        case 2 =>
          recon(o) = red(id, x, y); recon(o + 1) = green(id, x, y)
          recon(o + 2) = blue(id, x, y)
        case 6 =>
          recon(o) = red(id, x, y); recon(o + 1) = green(id, x, y)
          recon(o + 2) = blue(id, x, y); recon(o + 3) = alpha(x, y)
      }
    }
    // filtered scanlines: filter type y % 5 (every predictor exercised)
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = recon(y * stride + x)
        val a = if (x >= bpp) recon(y * stride + x - bpp) else 0
        val b = if (y > 0) recon((y - 1) * stride + x) else 0
        val c = if (x >= bpp && y > 0) recon((y - 1) * stride + x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = new Array[Byte](13)
    def putBe32(arr: Array[Byte], o: Int, v: Int): Unit = {
      arr(o) = (v >>> 24).toByte; arr(o + 1) = (v >>> 16).toByte
      arr(o + 2) = (v >>> 8).toByte; arr(o + 3) = v.toByte
    }
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = ct.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    // split the stream across two IDATs (decoders must concatenate)
    val z = zbuf.toByteArray
    val cut = z.length / 2
    chunk(out, "IDAT", z.take(cut))
    chunk(out, "IDAT", z.drop(cut))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
