package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** EXIF metadata extraction from scratch — no imaging library: locate the
  * JPEG APP1 segment by walking the marker stream, then parse the TIFF
  * structure inside it (CIPA DC-008 / TIFF 6.0): byte-order header (II
  * little-endian / MM big-endian), IFD entry walk with per-type value
  * sizes, inline-vs-offset value storage (values whose total size ≤ 4
  * bytes live left-justified IN the entry's value field; larger values
  * live at a u32 offset), and the Exif private sub-IFD behind tag 0x8769.
  * Unknown tags are skipped generically (type-driven sizes), so
  * writer-specific tags never break the walk — the same robustness
  * discipline as the parquet-footer thrift walker.
  *
  * Reference analog: none — the reference pipeline has no media handling
  * at all; this extends the multimodal family (SURVEY §2 extensions)
  * where typed metadata drives curation (orientation-aware dedup,
  * capture-time filtering, camera-model stratification).
  */
object Exif {

  /** Extracted metadata (None-able fields stay null-free here: fixtures
    * always carry the full set; real-world absence would surface as
    * Option fields in a production schema). */
  final case class ExifMeta(docId: Long, byteOrder: String, orientation: Int,
                            make: String, model: String, dateTime: String,
                            pxX: Int, pxY: Int, iso: Int, exposureDen: Int)

  private val TagMake = 0x010f
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132
  private val TagExifPtr = 0x8769
  private val TagExposure = 0x829a
  private val TagIso = 0x8827
  private val TagPxX = 0xa002
  private val TagPxY = 0xa003

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE / ASCII / SBYTE / UNDEFINED
    case 3 | 8         => 2 // SHORT / SSHORT
    case 4 | 9 | 11    => 4 // LONG / SLONG / FLOAT
    case 5 | 10 | 12   => 8 // RATIONAL / SRATIONAL / DOUBLE
    case _             => 1 // unknown: skip conservatively
  }

  /** One parsed IFD entry's value, reduced to what the tags above need.
    * `end` bounds the APP1 payload: an IFD whose entry table runs past it
    * is truncated, and the walk fails CLOSED (empty result → None). */
  private final class Reader(b: Array[Byte], tiffStart: Int, end: Int,
                             le: Boolean) {
    def u16(i: Int): Int =
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    /** Walk one IFD; returns (tag -> entry position) for requested tags
      * plus the Exif sub-IFD offset if present. */
    def ifdEntries(ifdOff: Int): Seq[(Int, Int)] = {
      val base = tiffStart + ifdOff
      if (base + 2 > end) return Seq.empty
      val n = u16(base)
      if (base + 2 + 12 * n > end) return Seq.empty // truncated entry table
      (0 until n).map { k =>
        val e = base + 2 + 12 * k
        u16(e) -> e
      }
    }

    /** Value bytes position: inline (entry + 8) when total ≤ 4, else at
      * the stored offset (relative to the TIFF header). */
    private def valuePos(entry: Int): Int = {
      val t = u16(entry + 2)
      val count = u32(entry + 4).toInt
      val total = typeSize(t) * count
      if (total <= 4) entry + 8 else tiffStart + u32(entry + 8).toInt
    }

    def shortValue(entry: Int): Int = u16(valuePos(entry))
    def longValue(entry: Int): Long = u32(valuePos(entry))
    def asciiValue(entry: Int): String = {
      val count = u32(entry + 4).toInt
      val p = valuePos(entry)
      if (p + count > b.length) return ""
      val raw = new String(b, p, count, StandardCharsets.US_ASCII)
      raw.takeWhile(_ != '\u0000')
    }
    /** RATIONAL: numerator/denominator u32 pair (always offset-stored). */
    def rationalDen(entry: Int): Long = u32(valuePos(entry) + 4)
  }

  /** Parse EXIF out of a JPEG byte stream: marker walk to APP1
    * ("Exif\0\0"), then the TIFF IFD walk. Returns None when no
    * well-formed EXIF APP1 exists. */
  def exifInfo(docId: Long, b: Array[Byte]): Option[ExifMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no EXIF
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (marker == 0xe1 && i + 4 + 6 <= b.length &&
        b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
        b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
        return parseTiff(docId, b, i + 10, i + 2 + len)
      }
      i += 2 + len
    }
    None
  }

  private def parseTiff(docId: Long, b: Array[Byte], tiffStart: Int,
                        end: Int): Option[ExifMeta] = try {
    if (tiffStart + 8 > end) return None
    val le = (b(tiffStart) & 0xff, b(tiffStart + 1) & 0xff) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _          => return None
    }
    val r = new Reader(b, tiffStart, math.min(end, b.length), le)
    if (r.u16(tiffStart + 2) != 42) return None
    val e0 = r.ifdEntries(r.u32(tiffStart + 4).toInt).toMap
    if (e0.isEmpty) return None // empty/truncated IFD0: malformed
    val exifOff = e0.get(TagExifPtr).map(r.longValue(_).toInt)
    val e1 = exifOff.map(o => r.ifdEntries(o).toMap).getOrElse(Map.empty)
    Some(ExifMeta(docId,
      byteOrder = if (le) "II" else "MM",
      orientation = e0.get(TagOrientation).map(r.shortValue).getOrElse(0),
      make = e0.get(TagMake).map(r.asciiValue).getOrElse(""),
      model = e0.get(TagModel).map(r.asciiValue).getOrElse(""),
      dateTime = e0.get(TagDateTime).map(r.asciiValue).getOrElse(""),
      pxX = e1.get(TagPxX).map(r.longValue(_).toInt).getOrElse(0),
      pxY = e1.get(TagPxY).map(r.longValue(_).toInt).getOrElse(0),
      iso = e1.get(TagIso).map(r.shortValue).getOrElse(0),
      exposureDen = e1.get(TagExposure).map(r.rationalDen(_).toInt)
        .getOrElse(0)))
  } catch { case _: ArrayIndexOutOfBoundsException => None }
}

/** Independent EXIF fixture encoder — shares no code with the parser
  * (separate writer helpers, offsets computed by construction, not by the
  * reader's rules). Every doc gets a REAL JPEG (the existing
  * [[JpegFixtures]] stream) with an APP1 EXIF segment spliced in: right
  * after SOI for even ids, after the first following segment for odd ids
  * (proving the marker WALK, not a fixed-offset peek). Endianness
  * alternates with doc_id so both TIFF byte orders round-trip, ASCII
  * values exceed 4 bytes (offset storage), orientation/ISO/dims are
  * inline, exposure is an offset-stored RATIONAL, and an Artist tag the
  * parser does not know sits mid-IFD to prove generic skip. */
private[graft] object ExifFixtures {

  def orientation(id: Long): Int = (id % 8 + 1).toInt
  def make(id: Long): String = "Maker" + (id % 5)
  def model(id: Long): String = "Cam" + (id % 7)
  def dateTime(id: Long): String =
    f"2026:08:${id % 28 + 1}%02d 10:${id % 60}%02d:00"
  def pxX(id: Long): Int = (64 + id % 100).toInt
  def pxY(id: Long): Int = (48 + id % 80).toInt
  def iso(id: Long): Int = (100 * (id % 4 + 1)).toInt
  def exposureDen(id: Long): Int = (id % 500 + 1).toInt
  def littleEndian(id: Long): Boolean = id % 2 == 0

  private final class W(le: Boolean) {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit =
      if (le) { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
      else { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    def ascii(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.US_ASCII))
    /** 12-byte IFD entry with an inline value already packed into `vf`
      * by the caller (left-justified per TIFF 6.0). */
    def entry(tag: Int, typ: Int, count: Int)(vf: => Unit): Unit = {
      u16(tag); u16(typ); u32(count)
      val before = out.size()
      vf
      while (out.size() < before + 4) u8(0)
    }
  }

  /** The TIFF payload (after "Exif\0\0"). */
  private def tiffBytes(id: Long): Array[Byte] = {
    val le = littleEndian(id)
    val w = new W(le)
    val mk = make(id) + "\u0000"
    val md = model(id) + "\u0000"
    val dt = dateTime(id) + "\u0000"
    val artist = "nobody\u0000"
    // layout: header(8) | IFD0: count(2) + 6*12 + next(4) | ExifIFD:
    // count(2) + 4*12 + next(4) | data: mk md dt artist exposure(8)
    val ifd0Off = 8
    val ifd0Size = 2 + 6 * 12 + 4
    val exifOff = ifd0Off + ifd0Size
    val exifSize = 2 + 4 * 12 + 4
    val dataOff = exifOff + exifSize
    val mkOff = dataOff
    val mdOff = mkOff + mk.length
    val dtOff = mdOff + md.length
    val artistOff = dtOff + dt.length
    val expOff = artistOff + artist.length
    // header
    w.ascii(if (le) "II" else "MM"); w.u16(42); w.u32(ifd0Off)
    // IFD0 (tags ascending)
    w.u16(6)
    w.entry(0x010f, 2, mk.length) { w.u32(mkOff) }
    w.entry(0x0110, 2, md.length) { w.u32(mdOff) }
    w.entry(0x0112, 3, 1) { w.u16(orientation(id)) }
    w.entry(0x0132, 2, dt.length) { w.u32(dtOff) }
    w.entry(0x013b, 2, artist.length) { w.u32(artistOff) } // unknown to parser
    w.entry(0x8769, 4, 1) { w.u32(exifOff) }
    w.u32(0) // no next IFD
    // Exif sub-IFD (tags ascending)
    w.u16(4)
    w.entry(0x829a, 5, 1) { w.u32(expOff) }
    w.entry(0x8827, 3, 1) { w.u16(iso(id)) }
    w.entry(0xa002, 4, 1) { w.u32(pxX(id)) }
    w.entry(0xa003, 4, 1) { w.u32(pxY(id)) }
    w.u32(0)
    // data area
    w.ascii(mk); w.ascii(md); w.ascii(dt); w.ascii(artist)
    w.u32(1L); w.u32(exposureDen(id).toLong)
    w.out.toByteArray
  }

  /** APP1 segment bytes: marker + length + "Exif\0\0" + TIFF. */
  private def app1(id: Long): Array[Byte] = {
    val tiff = tiffBytes(id)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xe1)
    val len = 2 + 6 + tiff.length
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write("Exif".getBytes(StandardCharsets.US_ASCII))
    out.write(0); out.write(0)
    out.write(tiff)
    out.toByteArray
  }

  /** A real JPEG with the EXIF APP1 spliced in: after SOI (even ids) or
    * after the first following marker segment (odd ids). */
  def synthJpegWithExif(id: Long): Array[Byte] = {
    val base = JpegFixtures.synthJpeg(id)
    val seg = app1(id)
    val at =
      if (littleEndian(id)) 2
      else { // skip SOI + first segment (its big-endian length at [4..5])
        val len = ((base(4) & 0xff) << 8) | (base(5) & 0xff)
        2 + 2 + len
      }
    val out = new ByteArrayOutputStream()
    out.write(base, 0, at)
    out.write(seg)
    out.write(base, at, base.length - at)
    out.toByteArray
  }
}
