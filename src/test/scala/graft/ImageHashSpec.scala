package graft

import org.apache.spark.sql.functions._

import graft.ops.{GifLzw, GifPixelFixtures, ImageHash}

/** Pixel-level GIF decode + perceptual hash: the LZW decoder must invert
  * the independent fixture compressor byte-for-byte (including dictionary
  * growth, width bumps, and the 4096 reset), decoded pixels must match
  * the fixture formulas, and the banded near-dup join must find the
  * planted same-base clusters. */
class ImageHashSpec extends SparkSuite {

  test("LZW round-trip: high-entropy stream forces width growth and dict reset") {
    val rnd = new java.util.Random(42)
    val n = 60000
    val indices = Array.fill[Byte](n)((rnd.nextInt(4)).toByte)
    val packed = GifPixelFixtures.compress(indices, minCodeSize = 2)
    // high-entropy 4-symbol data compresses poorly: dict must have grown
    // past the 8-bit boundary for this size, exercising width bumps
    val decoded = GifLzw.decode(packed, minCodeSize = 2, maxPixels = n)
    assert(decoded.isDefined)
    assert(decoded.get.toSeq === indices.toSeq)
  }

  test("LZW round-trip across code sizes 2..8 (wider palettes)") {
    val rnd = new java.util.Random(7)
    for (minCode <- 2 to 8) {
      val alphabet = 1 << minCode
      val data = Array.fill[Byte](8000)(rnd.nextInt(alphabet).toByte)
      val packed = GifPixelFixtures.compress(data, minCode)
      val decoded = GifLzw.decode(packed, minCode, data.length)
      assert(decoded.isDefined, s"minCode $minCode failed to decode")
      assert(decoded.get.toSeq === data.toSeq, s"minCode $minCode diverged")
    }
  }

  test("LZW round-trip: runs and repeats (KwKwK path)") {
    // aaaa... triggers the code==nextCode special case immediately
    for (pattern <- Seq(
        Array.fill[Byte](500)(1),
        Array.tabulate[Byte](1000)(i => (i % 2).toByte),
        (Array.fill[Byte](3)(0) ++ Array.fill[Byte](7)(3)) ++
          Array.tabulate[Byte](300)(i => (i % 4).toByte))) {
      val packed = GifPixelFixtures.compress(pattern, minCodeSize = 2)
      val decoded = GifLzw.decode(packed, 2, pattern.length)
      assert(decoded.isDefined && decoded.get.toSeq === pattern.toSeq)
    }
  }

  test("malformed payloads decode to None, never throw") {
    val rnd = new java.util.Random(3)
    val garbage = Array.fill[Byte](500)(rnd.nextInt(256).toByte)
    assert(ImageHash.decodeFirstFrame(garbage).isEmpty)
    // well-formed container, corrupt LZW stream: flip bytes inside the
    // image data of a valid fixture
    val b = GifPixelFixtures.synthPixelGif(1L)
    val info = graft.ops.GifHeaders.gifInfo(b).get
    val broken = b.clone()
    val f = info.frames.head
    var i = f.dataStart + 2
    while (i < f.dataEnd - 1) { broken(i) = (broken(i) ^ 0x5a).toByte; i += 3 }
    // must not throw; None or a (wrong) decode are both acceptable here —
    // the gate for CORRECT decode is the formula test below
    ImageHash.decodeFirstFrame(broken)
    // truncated payload
    assert(ImageHash.decodeFirstFrame(b.take(20)).isEmpty)
    // truncated LZW data via an early sub-block terminator
    assert(GifLzw.decode(Array[Byte](0x04, 0x02), 2, 1000).isEmpty)
  }

  test("decoded fixture pixels match the generator formulas exactly") {
    // encoder and decoder share no code: this is the codec gate
    // (0, 11, 22 are written INTERLACED — formula match proves de-interlacing)
    for (docId <- Seq(0L, 1L, 3L, 6L, 7L, 11L, 22L, 29L, 58L, 116L, 499L)) {
      val img = ImageHash.decodeFirstFrame(
        GifPixelFixtures.synthPixelGif(docId))
      assert(img.isDefined, s"doc $docId failed to decode")
      val g = img.get
      assert(g.width === GifPixelFixtures.width(docId))
      assert(g.height === GifPixelFixtures.height(docId))
      var mismatches = 0
      for (y <- 0 until g.height; x <- 0 until g.width) {
        val expected = GifPixelFixtures.palValue(
          docId, GifPixelFixtures.pixel(docId, 0, x, y))
        if (g.gray(y * g.width + x) != expected) mismatches += 1
      }
      assert(mismatches === 0, s"doc $docId: $mismatches pixel mismatches")
    }
  }

  test("second frame decodes with the advanced multiplier") {
    val docId = 3L // odd -> 2 frames
    val b = GifPixelFixtures.synthPixelGif(docId)
    val info = graft.ops.GifHeaders.gifInfo(b).get
    assert(info.frames.length === GifPixelFixtures.nFrames(docId))
    val f1 = ImageHash.decodeFrame(b, info, info.frames(1)).get
    val expect = GifPixelFixtures.palValue(
      docId, GifPixelFixtures.pixel(docId, 1, 5, 4))
    assert(f1.gray(4 * f1.width + 5) === expect)
  }

  test("dhash: left-dark right-bright image sets every row's comparison bits") {
    val w = 18; val h = 16
    val gray = Array.tabulate(w * h)(i => if (i % w < w / 2) 10 else 200)
    val (p0, p1, p2, p3) = ImageHash.dhash(ImageHash.GrayImage(w, h, gray))
    // cells 0..3 equal (dark), cell 4 mixed, 5..8 equal (bright): bits
    // where the right cell is brighter are exactly c=3 (dark<mixed) and
    // c=4 (mixed<bright) in every row r: idx = 8r+3 and 8r+4
    val expectBits = (0 until 8).flatMap(r => Seq(r * 8 + 3, r * 8 + 4)).toSet
    val got = (0 until 64).filter { idx =>
      val band = Seq(p0, p1, p2, p3)(idx / 16)
      (band & (1 << (idx % 16))) != 0
    }.toSet
    assert(got === expectBits)
  }

  test("dhash is invariant under a uniform brightness shift") {
    val w = 27; val h = 24
    val gray = Array.tabulate(w * h)(i => (i * 7) % 200)
    val img = ImageHash.GrayImage(w, h, gray)
    val shifted = ImageHash.GrayImage(w, h, gray.map(_ + 40))
    assert(ImageHash.dhash(img) === ImageHash.dhash(shifted))
  }

  test("incremental banded pairs equal the full join restricted to batch-touching pairs") {
    import spark.implicits._
    val media = (0L until 80L).toDF("doc_id").as[Long]
      .map(id => graft.ops.Multimodal.MediaRecord(
        id, GifPixelFixtures.synthPixelGif(id), "image"))
      .toDF()
    val fp = ImageHash.phash(spark, media).toDF()
    val incr = ImageHash.incrementalPhashPairs(
        fp.filter(col("doc_id") < 60), fp.filter(col("doc_id") >= 60), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = ImageHash.phashPairs(fp, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(t => t._1 >= 60 || t._2 >= 60).toSet
    assert(incr.nonEmpty)
    assert(incr === full)
  }

  test("banded near-dup join finds planted same-base clusters") {
    import spark.implicits._
    val media = (0L until 60L).toDF("doc_id").as[Long]
      .map(id => graft.ops.Multimodal.MediaRecord(
        id, GifPixelFixtures.synthPixelGif(id), "image"))
      .toDF()
    val ph = ImageHash.phash(spark, media).toDF()
    val pairs = ImageHash.phashPairs(ph, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same base, both unperturbed -> identical image pattern -> hamming 0
    assert(pairs.contains((1L, 8L)))
    assert(pairs.contains((2L, 9L)))
    // different base -> different geometry/pattern; 3 and 10 share base 3
    assert(pairs.contains((3L, 10L)))
    assert(!pairs.contains((1L, 2L)))
    // every same-base unperturbed pair must be present (hamming 0)
    val unperturbed = (0L until 60L).filterNot(GifPixelFixtures.perturbed)
    for (a <- unperturbed; b <- unperturbed if a < b &&
        GifPixelFixtures.base(a) == GifPixelFixtures.base(b)) {
      assert(pairs.contains((a, b)), s"missing identical pair ($a, $b)")
    }
  }

  test("banded recall law: hamming <= 3 collides in >= 1 band; 1 flip per band misses") {
    // the pigeonhole boundary behind phashPairs' maxHamming <= 3 guard,
    // pinned over RANDOM fingerprints (the planted-corpus tests above
    // only exercise the fixtures' hamming distribution): <= 3 flipped
    // bits cannot touch all 4 of the 16-bit bands, so the banded
    // equi-join's candidate set provably contains every such pair...
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val fp = Gen.listOfN(4, Gen.chooseNum(0, 0xffff)).map(_.toArray)
    val upTo3Flips = Gen.choose(0, 3).flatMap(k => Gen.pick(k, 0 until 64))
    val recall = Prop.forAll(fp, upTo3Flips) { (a, pos) =>
      val b = a.clone()
      pos.foreach(p => b(p / 16) ^= 1 << (p % 16))
      (0 until 4).exists(i => a(i) == b(i))
    }
    val r1 = SCTest.check(params, recall)
    assert(r1.passed, s"recall law failed: ${r1.status}")
    // ...and the boundary is TIGHT: an adversarial hamming-4 pair with
    // one flip in each band shares no band, so the join may miss it —
    // which is why the guard rejects maxHamming > 3 instead of
    // silently under-recalling
    val adversarial = Prop.forAll(fp, Gen.listOfN(4, Gen.chooseNum(0, 15))) {
      (a, offs) =>
        val b = a.clone()
        offs.zipWithIndex.foreach { case (o, i) => b(i) ^= 1 << o }
        (0 until 4).forall(i => a(i) != b(i))
    }
    val r2 = SCTest.check(params, adversarial)
    assert(r2.passed, s"adversarial miss law failed: ${r2.status}")
  }
}
