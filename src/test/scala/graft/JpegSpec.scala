package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Jpeg, JpegFixtures}

/** Baseline JPEG codec-chain laws. The DC-constant family is EXACT
  * (quantize->dequantize->IDCT of a constant block is integer
  * arithmetic); the general AC path is bounded-error (coefficient
  * rounding at quantization is the only loss at a flat q). */
class JpegSpec extends AnyFunSuite {

  test("block-constant fixtures decode to the exact closed form") {
    for (id <- 0L until 120L) {
      val img = Jpeg.decode(JpegFixtures.synthJpeg(id))
        .getOrElse(fail(s"decode failed for $id"))
      assert(img.width == JpegFixtures.width(id))
      assert(img.height == JpegFixtures.height(id))
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val want = JpegFixtures.expectedV(id, x / 8, y / 8)
        val got = img.gray(y * img.width + x)
        assert(got == want, s"id=$id ($x,$y): got $got want $want")
      }
    }
  }

  test("restart markers are present and reset DC prediction") {
    // bh >= 3 so at least one restart fires (DRI = 2 MCU rows)
    val id = 5L // blocksH = 2 + 5%4 = 3
    assert(JpegFixtures.blocksH(id) >= 3)
    val bytes = JpegFixtures.synthJpeg(id)
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "fixture should contain RSTn markers")
    assert(Jpeg.decode(bytes).isDefined)
  }

  test("3-component interleaved MCUs decode the luma plane exactly") {
    for (id <- 0L until 60L) {
      val img = Jpeg.decode(JpegFixtures.synthJpegColor(id))
        .getOrElse(fail(s"color decode failed for $id"))
      assert(img.nComp == 3)
      assert(img.width == JpegFixtures.width(id))
      assert(img.height == JpegFixtures.height(id))
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val want = JpegFixtures.expectedV(id, x / 8, y / 8)
        assert(img.gray(y * img.width + x) == want,
          s"color id=$id ($x,$y)")
      }
    }
  }

  test("general AC path: full-FDCT round-trip within quantization error") {
    val rnd = new scala.util.Random(42)
    val h = 24; val w = 21 // exercises edge-block crop too
    val pix = Array.tabulate(h, w)((_, _) => rnd.nextInt(256))
    val bytes = JpegFixtures.synthJpegFull(pix, qv = 1)
    // the fixed seed produces 0xFF entropy bytes -> stuffing exercised
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00),
      "expected byte stuffing in the entropy stream")
    val img = Jpeg.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs(img.gray(y * w + x) - pix(y)(x)))
    // rounding 64 coefficients by <= 0.5 bounds the pixel error by
    // 0.5 * (1/4) * (sum C(u))^2 ~ 7.4; typical is 1-2
    assert(maxErr <= 8, s"max reconstruction error $maxErr")
  }

  test("coarser quantization still decodes, with larger bounded error") {
    val rnd = new scala.util.Random(7)
    val pix = Array.tabulate(16, 16)((_, _) => rnd.nextInt(256))
    val img = Jpeg.decode(JpegFixtures.synthJpegFull(pix, qv = 4))
      .getOrElse(fail("decode failed"))
    var maxErr = 0
    for (y <- 0 until 16; x <- 0 until 16)
      maxErr = math.max(maxErr, math.abs(img.gray(y * 16 + x) - pix(y)(x)))
    assert(maxErr <= 32, s"max reconstruction error $maxErr")
  }

  test("non-baseline and truncated inputs refuse honestly") {
    val good = JpegFixtures.synthJpeg(3L)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    // flip SOF0 -> SOF2 (progressive): parser must return None
    val prog = good.clone()
    val sofAt = prog.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }
}
