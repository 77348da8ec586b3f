package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{SimHash, Winnow}

/** Property-based laws for the dedup kernels — driver-side evaluation of
  * the same static functions the Catalyst expressions call, so the laws
  * cover exactly the code the cluster executes. */
class DedupPropsSpec extends SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(60)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val doc: Gen[List[String]] = Gen.choose(5, 40).flatMap(Gen.listOfN(_, word))

  test("token_count equals size(regexp_extract_all(_, '\\S+')) on adversarial text") {
    // chars chosen to stress the boundary: every Java-regex \s member
    // (incl. \x0B where RE2 differs), non-\s unicode whitespace (NBSP —
    // must COUNT as token bytes), multi-byte chars, emoji (non-BMP)
    val tricky = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
      Gen.oneOf(" ", "é", "中", "😀"))).map(_.mkString)
    val re = """\S+""".r
    check(Prop.forAll(tricky) { s =>
      graft.functions.TokenCount.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) ==
        re.findAllIn(s).size
    })
  }

  test("chars_nospace equals length(regexp_replace(_, '\\s+', '')) on adversarial text") {
    val tricky = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
      Gen.oneOf(" ", "é", "中", "😀"))).map(_.mkString)
    check(Prop.forAll(tricky) { s =>
      // reference: strip Java-regex \s, count CODEPOINTS (what both
      // Spark length(UTF8String) and DuckDB length() count)
      val stripped = s.replaceAll("""\s+""", "")
      graft.functions.CharsNospace.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(stripped)) ==
        stripped.codePointCount(0, stripped.length) &&
      graft.functions.CharsNospace.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) ==
        stripped.codePointCount(0, stripped.length)
    })
  }

  test("norm_text equals trim(regexp_replace(lower(_), '\\s+', ' ')) on adversarial text") {
    val tricky = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
      Gen.oneOf(" ", "É", "İ", "ß", "中", "😀"))).map(_.mkString)
    check(Prop.forAll(tricky) { s =>
      // reference composition, layer by layer exactly as Spark evaluates
      // it: UTF8String.toLowerCase (what Lower applies under the default
      // collation), Java-regex \s+ collapse, then trim — after the
      // collapse the edges hold at most ONE ' ', so stripping single
      // spaces is the exact trim
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(s).toLowerCase.toString
      val expected = lowered.replaceAll("""\s+""", " ")
        .stripPrefix(" ").stripSuffix(" ")
      graft.functions.NormText.norm(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toString == expected
    })
  }

  test("simhash16 is token-order independent (vote sums commute)") {
    check(Prop.forAll(doc, Gen.long) { (words, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(words)
      SimHash.compute16String(words.mkString(" ")) ==
        SimHash.compute16String(shuffled.mkString(" "))
    })
  }

  test("simhash/simhash16 of identical text are identical; empty text is 0") {
    check(Prop.forAll(doc) { words =>
      val t = words.mkString(" ")
      SimHash.computeString(t) == SimHash.computeString(t) &&
        SimHash.compute16String(t) == SimHash.compute16String(t)
    })
    assert(SimHash.computeString("") == 0L && SimHash.compute16String("") == 0L)
  }

  test("winnowing theorem: shared substring of length >= W+K-1 shares a fingerprint") {
    // Schleimer/Wilkerson/Aiken guarantee: any match at least as long as
    // the guarantee threshold t = W+K-1 is caught by at least one shared
    // selected fingerprint
    val tLen = Winnow.W + Winnow.K - 1
    val chunk: Gen[String] =
      Gen.choose(tLen, tLen + 20).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    check(Prop.forAll(chunk, chunk, chunk, chunk) { (shared, p1, p2, s2) =>
      val a = p1 + shared + p2
      val b = p2 + s2 + shared
      val fa = Winnow.fingerprintsString(a).toSet
      val fb = Winnow.fingerprintsString(b).toSet
      fa.intersect(fb).nonEmpty
    })
  }

  test("winnow deque minima == brute-force windowed scan (incl. tie paths)") {
    // reference implementation: the O(n*W) rescan with rightmost-on-ties
    // selection the deque replaced; a tiny alphabet forces repeated
    // k-grams, so equal-hash tie handling is actually exercised
    def reference(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      if (n < Winnow.K) return Seq.empty
      val M = BigInt((1L << 61) - 1)
      val B = BigInt(1000003L)
      val hashes = (0 to n - Winnow.K).map(i =>
        (i until i + Winnow.K).foldLeft(BigInt(0))((h, j) => (h * B + cps(j)) mod M).toLong)
      val nGrams = hashes.length
      if (nGrams <= Winnow.W)
        return Seq(hashes.zipWithIndex.minBy { case (h, i) => (h, -i) }._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var lastIdx = -1
      for (i <- 0 to nGrams - Winnow.W) {
        val (mn, mi) = (i until i + Winnow.W).map(j => (hashes(j), j))
          .minBy { case (h, j) => (h, -j) }
        if (mi != lastIdx) { out += mn; lastIdx = mi }
      }
      out.toSeq
    }
    val tinyAlphabetDoc: Gen[String] =
      Gen.choose(0, 160).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', ' '))).map(_.mkString)
    check(Prop.forAll(tinyAlphabetDoc) { s =>
      Winnow.fingerprintsString(s).toSeq == reference(s)
    })
  }

  test("winnow is deterministic and position-robust (prefix shift keeps overlap)") {
    check(Prop.forAll(doc, word) { (words, prefix) =>
      val t = words.mkString(" ")
      val shifted = prefix + " " + t
      val f1 = Winnow.fingerprintsString(t).toSet
      val f2 = Winnow.fingerprintsString(shifted).toSet
      // the common suffix is the whole of t; if t is long enough to carry
      // a guaranteed match, the shifted doc must share a fingerprint
      f1 == Winnow.fingerprintsString(t).toSet &&
        (t.length < Winnow.W + Winnow.K - 1 || f1.intersect(f2).nonEmpty)
    })
  }
}
