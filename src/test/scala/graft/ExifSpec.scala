package graft

import graft.ops.{Exif, ExifFixtures, JpegFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** EXIF parser laws: both TIFF byte orders round-trip the independent
  * fixture encoder, the APP1 segment is found by WALKING markers (odd
  * ids bury it behind another segment), inline and offset value storage
  * both decode, unknown tags are skipped, and malformed inputs return
  * None instead of throwing. */
class ExifSpec extends AnyFunSuite {

  test("round-trip both endiannesses against the fixture formulas") {
    (0L until 64L).foreach { id =>
      val meta = Exif.exifInfo(id, ExifFixtures.synthJpegWithExif(id))
        .getOrElse(fail(s"no EXIF parsed for id $id"))
      assert(meta.byteOrder == (if (id % 2 == 0) "II" else "MM"))
      assert(meta.orientation == ExifFixtures.orientation(id), s"id $id")
      assert(meta.make == ExifFixtures.make(id))
      assert(meta.model == ExifFixtures.model(id))
      assert(meta.dateTime == ExifFixtures.dateTime(id))
      assert(meta.pxX == ExifFixtures.pxX(id))
      assert(meta.pxY == ExifFixtures.pxY(id))
      assert(meta.iso == ExifFixtures.iso(id))
      assert(meta.exposureDen == ExifFixtures.exposureDen(id))
    }
  }

  test("odd ids place APP1 after another segment — found by the walk") {
    // byte 2 of an odd-id fixture is NOT the APP1 marker
    val b = ExifFixtures.synthJpegWithExif(3L)
    assert((b(3) & 0xff) != 0xe1, "odd fixtures must not start with APP1")
    assert(Exif.exifInfo(3L, b).isDefined)
  }

  test("a plain JPEG without EXIF returns None; truncation returns None") {
    assert(Exif.exifInfo(7L, JpegFixtures.synthJpeg(7L)).isEmpty)
    val b = ExifFixtures.synthJpegWithExif(8L)
    // cut inside the TIFF payload: the parser must fail closed
    assert(Exif.exifInfo(8L, b.take(24)).isEmpty)
    assert(Exif.exifInfo(8L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("the Artist tag (unknown to the parser) does not disturb the walk") {
    // the fixture writes Artist (0x013B) between DateTime and ExifPtr;
    // all parsed fields around it must still be correct — id 1 exercises
    // MM, id 2 II
    Seq(1L, 2L).foreach { id =>
      val meta = Exif.exifInfo(id, ExifFixtures.synthJpegWithExif(id)).get
      assert(meta.dateTime == ExifFixtures.dateTime(id))
      assert(meta.pxX == ExifFixtures.pxX(id)) // sub-IFD behind the pointer
    }
  }
}
