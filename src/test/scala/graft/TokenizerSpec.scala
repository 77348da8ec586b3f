package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Unigram, WordPiece}
import graft.queries.TokenizerQueries

/** Laws for the BPE trainer beyond its oracle rows: merging never
  * destroys or creates characters, the apply is greedy-leftmost
  * non-overlapping (the BPE semantics the bracket representation
  * exists to guarantee), and the segment counts are mutually bounded. */
class TokenizerSpec extends SparkSuite {

  test("char mass is conserved: stripped final repr equals the word") {
    val (_, repr) = Bpe.trained(spark, sf)
    val broken = repr.filter(
      translate(col("repr"), "[]", "") =!=
        expr("replace(word, '][', '')")) // words have no brackets; identity
    assert(broken.count() == 0L)
  }

  test("merge apply is greedy leftmost non-overlapping") {
    import spark.implicits._
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, repr) = Bpe.train(docs, 1)
    assert(merges == Seq(Bpe.Merge(0, "a", "a", 4L)))
    // leftmost-first: [a][a][a] -> [aa][a], never [a][aa]
    val r = repr.select("repr").as[String].collect()
    assert(r.sameElements(Array("[aa][a]")))
  }

  test("training runs dry gracefully when every word is one symbol") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    // round 0 merges (a,b); afterwards "ab" is a single symbol and no
    // pair exists — extra rounds must not throw or invent merges
    val (merges, repr) = Bpe.train(docs, 4)
    assert(merges == Seq(Bpe.Merge(0, "a", "b", 3L)))
    assert(repr.select("repr").as[String].collect().sameElements(Array("[ab]")))
  }

  test("q_bpe_train emits one strictly-positive merge per round") {
    val m = TokenizerQueries.queries("q_bpe_train")(spark, sf).collect()
    assert(m.length == Bpe.Rounds)
    assert(m.map(_.getInt(0)).toSeq == (0 until Bpe.Rounds))
    assert(m.forall(_.getLong(3) > 0L))
  }

  test("segment counts are mutually bounded: tokens <= symbols <= chars") {
    val bad = TokenizerQueries.queries("q_bpe_segment")(spark, sf)
      .filter(col("n_symbols") < col("n_tokens") ||
        col("n_chars") < col("n_symbols"))
    assert(bad.count() == 0L)
  }

  test("encode: symbols reconstruct the source words, ids are a dense bijection") {
    val enc = TokenizerQueries.queries("q_bpe_encode")(spark, sf).cache()
    // LOSSLESS: concatenating a position's symbols in sym_idx order must
    // rebuild the original word at that position exactly
    val rebuilt = enc.groupBy("doc_id", "pos")
      .agg(concat_ws("", org.apache.spark.sql.functions.array_sort(
        collect_list(struct(col("sym_idx"), col("symbol"))))
        .getField("symbol")).as("word"))
    val expected = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "w")))
      .filter(col("w") =!= "" && col("p") < 10)
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("w"))
    val broken = rebuilt.join(expected, Seq("doc_id", "pos"))
      .filter(col("word") =!= col("w")).count()
    assert(broken == 0, "token stream does not reconstruct the corpus")
    // ids: one id per symbol, dense 0..V-1
    val ids = enc.select("symbol", "token_id").distinct().collect()
    assert(ids.map(_.getString(0)).distinct.length == ids.length)
    val idVals = ids.map(_.getInt(1)).sorted
    assert(idVals.head == 0 && idVals.last == idVals.length - 1 &&
      idVals.distinct.length == idVals.length,
      "token ids must be dense and unique")
    enc.unpersist()
  }

  test("unigram encode: pieces reconstruct in-cap words, ids match the train rank") {
    val enc = TokenizerQueries.queries("q_unigram_encode")(spark, sf).cache()
    val rebuilt = enc.groupBy("doc_id", "pos")
      .agg(concat_ws("", org.apache.spark.sql.functions.array_sort(
        collect_list(struct(col("piece_idx"), col("piece"))))
        .getField("piece")).as("word"))
    // in-cap words only: the encode contract drops words past the
    // trainer's length cap (same as q_unigram_segment)
    val expected = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "w")))
      .filter(col("w") =!= "" && col("p") < 10 &&
        length(col("w")) <= graft.ops.Unigram.MaxWordLen)
    val exp = expected
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("w"))
    val broken = rebuilt.join(exp, Seq("doc_id", "pos"))
      .filter(col("word") =!= col("w")).count()
    assert(broken == 0, "unigram stream does not reconstruct the corpus")
    assert(rebuilt.count() == exp.count(), "stream covers every in-cap word")
    // ids: injective over pieces, and equal to train rank - 1
    val trainIds = TokenizerQueries.queries("q_unigram_train")(spark, sf)
      .select(col("piece"), (col("rank") - 1).as("tid")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val ids = enc.select("piece", "token_id").distinct().collect()
    assert(ids.map(_.getString(0)).distinct.length == ids.length)
    var sawUnk = false
    ids.foreach { r =>
      val (piece, tid) = (r.getString(0), r.getInt(1))
      trainIds.get(piece) match {
        case Some(want) => assert(tid == want, s"piece $piece id mismatch")
        case None => // Viterbi single-char fallback outside the vocab
          assert(tid == -1 && piece.length == 1, s"piece $piece not UNK")
          sawUnk = true
      }
    }
    assert(sawUnk, "fixture never exercised the UNK path")
    enc.unpersist()
    graft.core.SharedFrames.clear()
  }

  // ---- unigram-LM trainer laws ([[graft.ops.Unigram]]) ----

  /** The Viterbi objective restated independently: fewest pieces, then
    * largest score sum, then longest piece — over a plain Scala DP. */
  private def naiveSegment(word: String, vm: Map[String, Long]): List[String] = {
    val best = new Array[(Int, Long, List[String])](word.length + 1)
    best(0) = (0, 0L, Nil)
    for (i <- 1 to word.length) {
      val cands = (1 to math.min(i, Unigram.MaxPieceLen)).flatMap { l =>
        val piece = word.substring(i - l, i)
        if (l == 1 || vm.contains(piece))
          Some((best(i - l)._1 + 1, best(i - l)._2 - vm.getOrElse(piece, 0L),
            -l, best(i - l)._3 :+ piece))
        else None
      }
      val b = cands.minBy(c => (c._1, c._2, c._3))
      best(i) = (b._1, b._2, b._4)
    }
    best(word.length)._3
  }

  private def naivePrune(v: Map[String, Long], keep: Int): Map[String, Long] = {
    val multi = v.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, s) => (-s, p) }.take(keep)
    (multi ++ v.filter(_._1.length == 1).toSeq).toMap
  }

  private def naiveTrain(wc: Map[String, Long]): Map[String, Long] = {
    val words = wc.filter(_._1.length <= Unigram.MaxWordLen)
    val seed = naivePrune(
      (for { (w, c) <- words.toSeq; l <- 1 to Unigram.MaxPieceLen
             i <- 0 to w.length - l } yield (w.substring(i, i + l), c))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum },
      Unigram.SeedSize)
    Unigram.PruneSchedule.foldLeft(seed) { (v, keep) =>
      naivePrune(
        (for ((w, c) <- words.toSeq; p <- naiveSegment(w, v)) yield (p, c))
          .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum },
        keep)
    }
  }

  test("unigram: Viterbi segmentation round-trips every corpus word") {
    val segs = Unigram.segments(
      Unigram.trainedWords(spark, sf), Unigram.trained(spark, sf))
    val broken = segs
      .filter(concat_ws("", col("segs")) =!= col("word")).count()
    assert(broken == 0L, "pieces must concatenate back to the word")
  }

  test("unigram EM equals a naive in-memory reimplementation") {
    import spark.implicits._
    val raw = Seq("banana", "banana", "bandana", "cabana", "ana", "banana",
      "nab", "an", "na", "ban", "supercalifragilistic")
    // the 20-char word is past MaxWordLen: the cap must exclude it from
    // the EM statistics on both paths
    val docs = Seq((0L, raw.take(6).mkString(" ")),
      (1L, raw.drop(6).mkString(" "))).toDF("doc_id", "text")
    val got = Unigram.train(Unigram.wordCounts(docs)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = naiveTrain(
      raw.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong })
    assert(got == want)
    assert(!got.keys.exists(_.length > Unigram.MaxPieceLen))
  }

  test("unigram: a supplementary-plane char survives every prune round") {
    import spark.implicits._
    // one CODE POINT but Java length 2: if the driver-side prune
    // classified by UTF-16 length it would compete in the multi-char
    // branch instead of the always-kept single-char branch
    val parrot = new String(Character.toChars(0x1F99C))
    // 45 distinct 2-char words (score 2 each) swamp every prune cutoff
    // (seed 60, schedule 40/25/15) so a multi-char-classified parrot
    // (score 1, highest UTF-8 bytes -> last among ties) must fall out
    val letters = "abcdefghij"
    val words = (for { a <- letters; b <- letters if a < b }
      yield s"$a$b").take(45)
    val docs = Seq((0L, (words ++ words :+ parrot).mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = Unigram.train(Unigram.wordCounts(docs)).collect()
      .map(_.getString(0)).toSet
    assert(vocab.contains(parrot),
      "non-BMP single code point dropped by the driver-side prune")
    // and the segmentation law still holds over the non-BMP corpus
    val segs = Unigram.segments(Unigram.wordCounts(docs),
      Unigram.train(Unigram.wordCounts(docs)))
    assert(segs.filter(concat_ws("", col("segs")) =!= col("word"))
      .count() == 0L)
  }

  test("byte-level bpe: symbols unhex back to the exact UTF-8 bytes, no UNK") {
    import spark.implicits._
    val parrot = new String(Character.toChars(0x1F99C)) // 4 UTF-8 bytes
    val docs = Seq(
      (0L, s"hello hello world $parrot$parrot café café"),
      (1L, s"hello world café $parrot mixed${parrot}scripts")
    ).toDF("doc_id", "text")
    val (merges, repr) = Bpe.trainBytes(docs, Bpe.Rounds)
    assert(merges.nonEmpty)
    // every symbol is whole hex bytes (even length, hex alphabet)...
    val rows = repr.select(col("word"),
        split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\[").as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    assert(rows.nonEmpty)
    rows.foreach { case (_, syms) =>
      syms.foreach { s =>
        assert(s.length % 2 == 0 && s.matches("[0-9A-F]+"), s"bad symbol $s")
      }
    }
    // ...and the concatenated symbols round-trip to the word's exact
    // UTF-8 bytes — any input tokenizes, no UNK, including the non-BMP
    // emoji and the multi-byte e-acute
    rows.foreach { case (word, syms) =>
      val bytes = syms.mkString.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") == word,
        s"round-trip broke for '$word'")
    }
    graft.core.SharedFrames.clear()
  }

  test("wordpiece: likelihood-gain merges on a hand-traced corpus") {
    import spark.implicits._
    // words ab(x2), abc(x1): pair (a,b) n=3 ca=3 cb=3 and (b,c) n=1
    // ca=3 cb=1 TIE at floor(1e12/3); (w1,w2) tiebreak picks (a,b).
    // round 1: symbols ab(3), c(1); only pair (ab,c) merges.
    val docs = Seq((0L, "ab ab abc")).toDF("doc_id", "text")
    val (merges, repr) = WordPiece.train(docs, WordPiece.Rounds)
    assert(merges == Seq(
      WordPiece.Merge(0, "a", "b", 3L, 3L, 3L, 333333333333L),
      WordPiece.Merge(1, "ab", "c", 1L, 3L, 1L, 333333333333L)))
    val reprs = repr.select("word", "repr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reprs == Map("ab" -> "[ab]", "abc" -> "[abc]"))
  }

  test("wordpiece: max-munch takes the longest piece, not the merge order") {
    import spark.implicits._
    // structural laws of leftmost-longest: piece counts land in
    // [ceil(len/maxlen), len], and a word that is itself a vocab piece
    // must segment to exactly 1 (the merge REPLAY can split such a word
    // when the merge order never built it at that position — max-munch
    // cannot)
    val words = WordPiece.trainedWords(spark, sf)
    val (_, repr) = WordPiece.trained(spark, sf)
    val vocab = WordPiece.vocabulary(words, repr)
    val maxLen = vocab.select(max(length(col("piece")))).collect()(0).getInt(0)
    val segs = WordPiece.segments(words, vocab)
      .select(col("word"), col("n_pieces")).collect()
      .map(r => r.getString(0) -> r.getInt(1))
    assert(segs.nonEmpty)
    val vocabSet = vocab.select("piece").collect().map(_.getString(0)).toSet
    segs.foreach { case (w, np) =>
      assert(np >= (w.length + maxLen - 1) / maxLen && np <= w.length,
        s"word $w pieces $np maxlen $maxLen")
      if (vocabSet(w)) assert(np == 1, s"in-vocab word $w split into $np")
    }
  }

  test("wordpiece score product survives corpus-scale counts (no 2^63 wrap)") {
    // ca=cb=3e12 occurrences: the raw long product 9e24 wraps; the
    // DECIMAL(38,0) path must not
    val (n, ca, cb) = (BigInt("2000000000000"), BigInt("3000000000000"),
      BigInt("3000000000000"))
    val want = (BigInt("1000000000000") * n) / (ca * cb)
    val got = spark.sql(
      s"""SELECT (1000000000000L * CAST(${n} AS DECIMAL(38,0)))
         | div (CAST(${ca} AS DECIMAL(38,0)) * ${cb}L) AS s""".stripMargin)
      .collect()(0).getLong(0)
    assert(got == want.toLong, s"$got vs $want")
  }
}
