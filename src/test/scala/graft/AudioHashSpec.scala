package graft

import graft.ops.{AudioFixtures, AudioHash, ImageHash}

/** PCM decode + energy fingerprint: the sample reader must invert the
  * independent fixture writer exactly, survive foreign RIFF chunks, and
  * the banded near-dup join must find the planted same-base clusters. */
class AudioHashSpec extends SparkSuite {

  test("decoded PCM samples match the generator formulas exactly") {
    for (docId <- Seq(0L, 1L, 4L, 5L, 31L, 62L, 119L, 499L)) {
      val s = AudioHash.pcmSamples(AudioFixtures.synthWav(docId))
      assert(s.isDefined, s"doc $docId failed to decode")
      assert(s.get.length === AudioFixtures.nSamples(docId))
      val bad = s.get.indices.count(t => s.get(t) != AudioFixtures.sample(docId, t))
      assert(bad === 0, s"doc $docId: $bad sample mismatches")
    }
  }

  test("parser skips foreign chunks (LIST before data) and odd-size padding") {
    // hand-build: RIFF [LIST chunk of 5 bytes + pad] [fmt ] [data 4 samples]
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def tag4(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag4("RIFF"); u32(70); tag4("WAVE")
    tag4("LIST"); u32(5); (0 until 5).foreach(u8); u8(0) // odd size -> pad
    tag4("fmt "); u32(16); u16(1); u16(1); u32(8000); u32(16000); u16(2); u16(16)
    tag4("data"); u32(8)
    Seq(100, -100, 32767, -32768).foreach(u16)
    val s = AudioHash.pcmSamples(out.toByteArray)
    assert(s.isDefined)
    assert(s.get.toSeq === Seq(100, -100, 32767, -32768))
  }

  test("energy fingerprint: rising ramp sets every comparison bit") {
    // strictly increasing |amplitude| => every window's mean energy below
    // the next => all 64 bits set
    val ramp = Array.tabulate(650)(t => t * 50)
    val Some((_, (p0, p1, p2, p3))) = AudioHash.energyBands(ramp)
    assert(Seq(p0, p1, p2, p3).forall(_ === 0xffff))
    // falling ramp: no bits
    val Some((_, (q0, q1, q2, q3))) = AudioHash.energyBands(ramp.reverse)
    assert(Seq(q0, q1, q2, q3).forall(_ === 0))
  }

  test("fingerprint is invariant under uniform gain") {
    val s = Array.tabulate(1000)(t => ((t * t + 3 * t) % 977) - 488)
    val Some((e1, b1)) = AudioHash.energyBands(s)
    val Some((e3, b3)) = AudioHash.energyBands(s.map(_ * 3))
    assert(b1 === b3) // comparisons scale together
    assert(e3 === 3 * e1) // energies do not
  }

  test("banded near-dup join finds planted same-base audio clusters") {
    import spark.implicits._
    val media = (0L until 60L).toDF("doc_id").as[Long]
      .map(id => graft.ops.Multimodal.MediaRecord(
        id, AudioFixtures.synthWav(id), "audio"))
      .toDF()
    val fp = AudioHash.fingerprint(spark, media).toDF()
    val pairs = ImageHash.phashPairs(fp, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unclicky = (0L until 60L).filterNot(AudioFixtures.clicky)
    for (a <- unclicky; b <- unclicky if a < b &&
        AudioFixtures.abase(a) == AudioFixtures.abase(b)) {
      assert(pairs.contains((a, b)), s"missing identical pair ($a, $b)")
    }
    // different-base signals have different lengths and waveforms
    assert(!pairs.contains((1L, 2L)))
  }

  test("banded recall law over audio fingerprints: hamming <= 3 exact, 4 can miss") {
    // audio fingerprints share the image dHash band shape (4 x 16-bit
    // ints through the same phashPairs join), so they inherit the same
    // pigeonhole claim — pinned here over random fingerprints rather
    // than only the planted WAV corpus
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val fp = Gen.listOfN(4, Gen.chooseNum(0, 0xffff)).map(_.toArray)
    val upTo3Flips = Gen.choose(0, 3).flatMap(k => Gen.pick(k, 0 until 64))
    val recall = Prop.forAll(fp, upTo3Flips) { (a, pos) =>
      val b = a.clone()
      pos.foreach(p => b(p / 16) ^= 1 << (p % 16))
      (0 until 4).exists(i => a(i) == b(i))
    }
    val r1 = SCTest.check(params, recall)
    assert(r1.passed, s"recall law failed: ${r1.status}")
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
