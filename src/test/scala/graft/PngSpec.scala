package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.ops.{Png, PngFixtures}

/** The PNG decoder's independence checks: fixture round-trip (own
  * encoder), a THIRD-PARTY encoder cross-check (ImageIO — a codebase the
  * decoder shares nothing with), and malformed-input rejection. */
class PngSpec extends SparkSuite {

  test("fixture round-trip: luma equals the formulas for every color type") {
    for (id <- 0L until 24L) { // covers all 3 color types x filter mixes
      val img = Png.decode(PngFixtures.synthPng(id))
        .getOrElse(fail(s"decode failed for id=$id"))
      assert(img.width == PngFixtures.width(id))
      assert(img.height == PngFixtures.height(id))
      assert(img.colorType == PngFixtures.colorType(id))
      // height >= 14 > 5, so rows exercise all five filter types
      for (y <- 0 until img.height; x <- 0 until img.width)
        assert(img.gray(y * img.width + x) == PngFixtures.expectedLuma(id, x, y),
          s"pixel ($x,$y) of id=$id (filter ${y % 5})")
    }
  }

  test("ImageIO-encoded PNGs decode to identical pixels") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val w = 20 + rnd.nextInt(20); val h = 15 + rnd.nextInt(20)
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(y)(x)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(bi, "png", baos))
      val img = Png.decode(baos.toByteArray)
        .getOrElse(fail("decode of ImageIO output failed"))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(y)(x)
        assert(img.gray(y * w + x) == (299 * r + 587 * g + 114 * b) / 1000)
      }
    }
  }

  test("malformed payloads are rejected, never thrown on") {
    val good = PngFixtures.synthPng(7L)
    assert(Png.decode(Array[Byte](1, 2, 3)).isEmpty) // not a PNG
    assert(Png.decode(good.take(40)).isEmpty) // truncated mid-chunk
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x5a).toByte
    assert(Png.decode(flipped).isEmpty) // CRC catches payload corruption
    val badSig = good.clone(); badSig(0) = 0
    assert(Png.decode(badSig).isEmpty)
  }
}
