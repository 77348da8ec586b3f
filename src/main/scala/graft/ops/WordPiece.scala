package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SharedFrames

/** Distributed WordPiece tokenizer training — the third production
  * tokenizer algorithm next to [[Bpe]] (frequency argmax) and
  * [[Unigram]] (EM): WordPiece merges the pair with the highest
  * LIKELIHOOD GAIN, score(a,b) = count(ab) / (count(a)·count(b))
  * (Schuster & Nakajima 2012; the BERT trainer), and its apply side is
  * greedy longest-match-first ("maximum munch") segmentation rather
  * than merge replay.
  *
  * EXACTNESS. The score is a ratio of unbounded corpus counts; floats
  * would make the argmax engine-dependent. Instead the ranking key is
  * the exact integer ⌊1e12·n/(ca·cb)⌋ with the count product widened to
  * DECIMAL(38,0)/HUGEINT first (n ≤ min(ca,cb) ⇒ the scaled score is
  * ≤ 1e12 and fits a BIGINT). Two pairs whose true ratios differ only
  * beyond the 12th digit tie under the floor — the (w1, w2) tiebreak
  * makes the argmax total and both engines replay it bit-for-bit.
  *
  * SCALE SHAPE (the [[Bpe]] word-count formulation): ONE corpus pass
  * counts words — capped at [[MaxWordLen]] chars like [[Unigram]], the
  * sentence-length cap real trainers apply, which also bounds the
  * oracle's position-unrolled segmentation replay. Per round: one
  * symbol-count and one pair-count aggregation over the vocab-bounded
  * word frame (map-side combined), a broadcast-sized join of pair
  * counts to the two symbol counts, a 1-row argmax pull, one `replace`
  * projection. The corpus is touched exactly once.
  */
object WordPiece {

  /** One training round's outcome: pair merged, raw pair count, the two
    * symbol counts, and the exact scaled likelihood-gain score. */
  case class Merge(round: Int, w1: String, w2: String, n: Long,
      ca: Long, cb: Long, scoreScaled: Long)

  /** Fixed merge budget, like [[Bpe.Rounds]]. */
  val Rounds = 6

  /** EM-statistics word-length cap, shared with the segmentation
    * replay: the greedy scan unrolls one oracle stage per position. */
  val MaxWordLen = 16

  private val mergeCache = TrieMap.empty[String, Seq[Merge]]

  private def cacheKey(spark: SparkSession, dir: String): String =
    s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}:$dir"

  /** (word, cnt) over the documents table, length-capped — the one
    * corpus pass. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Per-symbol occurrence counts over the current representation,
    * weighted by word count — the score denominators. */
  private def symCounts(repr: DataFrame): DataFrame =
    repr.select(col("cnt"),
        explode(split(expr("substring(repr, 2, length(repr) - 2)"),
          "\\]\\[")).as("sym"))
      .groupBy("sym").agg(sum("cnt").as("c"))

  /** Train `rounds` likelihood-gain merges, returning the merge list and
    * the final (word, cnt, repr) frame. Pure function of the corpus. */
  def train(docs: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    val wc = SharedFrames.register(wordCounts(docs))
    var repr = Bpe.initialRepr(wc)
    val merges = Seq.newBuilder[Merge]
    for (r <- 0 until rounds) {
      val sc = symCounts(repr)
      val best = Bpe.pairCounts(repr)
        .join(sc.select(col("sym").as("w1"), col("c").as("ca")), Seq("w1"))
        .join(sc.select(col("sym").as("w2"), col("c").as("cb")), Seq("w2"))
        // decimal-first: ca·cb is a product of unbounded corpus counts
        .withColumn("score_scaled", expr(
          """(1000000000000L * CAST(n AS DECIMAL(38,0)))
            | div (CAST(ca AS DECIMAL(38,0)) * cb)""".stripMargin))
        .select("w1", "w2", "n", "ca", "cb", "score_scaled")
        .orderBy(col("score_scaled").desc, col("w1"), col("w2"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val row = best(0)
        val (w1, w2) = (row.getString(0), row.getString(1))
        merges += Merge(r, w1, w2, row.getLong(2), row.getLong(3),
          row.getLong(4), row.getLong(5))
        repr = repr.withColumn("repr",
          replace(col("repr"), lit(s"[$w1][$w2]"), lit(s"[$w1$w2]")))
      }
    }
    (merges.result(), repr)
  }

  /** Inference vocabulary: every symbol surviving in the final
    * representation PLUS the full single-char alphabet of the word
    * frame — a character whose every occurrence was merged away must
    * stay segmentable, the WordPiece alphabet-retention rule. */
  def vocabulary(words: DataFrame, repr: DataFrame): DataFrame =
    repr.select(explode(split(expr("substring(repr, 2, length(repr) - 2)"),
        "\\]\\[")).as("piece"))
      .unionByName(words.select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("piece")))
      .distinct()

  /** The in-row greedy maximum-munch scan: fold over character
    * positions; at the current cursor take the LONGEST vocab piece
    * starting there (single chars always admissible as the fallback),
    * advance the cursor past it, count one piece. One projection, no
    * per-position joins. Expects columns `word` and `vm:
    * map<string,int>`. */
  private[graft] def segmentExpr: Column = expr(
    s"""aggregate(
       |  sequence(1, length(word)),
       |  named_struct('pos', 1, 'np', 0),
       |  (acc, i) -> IF(acc.pos != i, acc, named_struct(
       |    'pos', i + coalesce(array_max(filter(
       |      sequence(1, least($MaxWordLen, length(word) - i + 1)),
       |      l -> map_contains_key(vm, substring(word, i, l)))), 1),
       |    'np', acc.np + 1)),
       |  acc -> acc.np)""".stripMargin)

  /** Greedy piece counts for every word under `vocab`: the vocab
    * collapses to a 1-row membership map and broadcasts. */
  def segments(words: DataFrame, vocab: DataFrame): DataFrame = {
    val vm = vocab.agg(
      map_from_entries(collect_list(struct(col("piece"), lit(1))))
        .as("vm"))
    words.crossJoin(broadcast(vm))
      .select(col("word"), col("cnt"), segmentExpr.as("n_pieces"))
  }

  /** Session-cached training over the documents table at `dir`: merge
    * list + final representation, shared by train/segment queries and
    * the bench. */
  def trained(spark: SparkSession, dir: String): (Seq[Merge], DataFrame) = {
    val frame = SharedFrames.cached(spark, s"wordpiece:$dir") {
      val (m, f) = train(graft.core.Tables.documents(spark, dir), Rounds)
      mergeCache.put(cacheKey(spark, dir), m)
      f
    }
    (mergeCache(cacheKey(spark, dir)), frame)
  }

  /** Cached capped word frame (for the apply-side query). */
  def trainedWords(spark: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(spark, s"wordpiecewc:$dir") {
      wordCounts(graft.core.Tables.documents(spark, dir))
    }
}
