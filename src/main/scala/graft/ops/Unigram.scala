package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SharedFrames

/** Distributed unigram-LM (SentencePiece-style) tokenizer training — the
  * EM companion to [[Bpe]]: seed a candidate vocabulary from substrings,
  * then alternate (E) Viterbi-segment every word under the current piece
  * scores and (M) re-score pieces by their segmentation usage, pruning
  * the vocabulary on a fixed schedule. Together with BPE this covers
  * both production tokenizer-training algorithms.
  *
  * EXACTNESS. Real unigram training maximizes Π p(piece) with float log
  * probabilities; IEEE `ln` is not bit-reproducible across engines, so —
  * the same discipline as the log-free rational-idf BM25
  * ([[Retrieval.bm25ScoresFromIndex]]) — the Viterbi objective here is
  * the float-free MDL-style order: FEWEST pieces, then LARGEST total
  * piece score, then longest final piece. Every score is an exact
  * integer count, every tiebreak deterministic, so the Spark loop and
  * the unrolled DuckDB oracle agree bit-for-bit.
  *
  * SCALE SHAPE (the [[Bpe]] word-count formulation): ONE corpus pass
  * counts words; everything after runs on the (word, cnt) frame —
  * Heaps-law sublinear in corpus size. Per EM round: the vocabulary
  * (≤ SeedSize + alphabet rows) collapses to a 1-row map literal and
  * broadcasts; the Viterbi DP runs IN-ROW over each word via the
  * `aggregate` higher-order function (no per-position joins, no
  * shuffle); usage re-scoring is one map-side-combined aggregation.
  * Words longer than [[MaxWordLen]] chars (URLs, hash blobs) are
  * excluded from the EM statistics — the sentence-length cap real
  * trainers apply.
  */
object Unigram {

  /** Trainer caps: candidate pieces up to 4 chars, EM statistics from
    * words up to 16 chars. */
  val MaxPieceLen = 4
  val MaxWordLen = 16

  /** Seed keeps the top [[SeedSize]] multi-char substrings (all single
    * chars always survive — the fallback alphabet); each EM round prunes
    * to the next [[PruneSchedule]] size. Fixed horizon, like
    * [[Bpe.Rounds]]: a data-dependent stop would make the unrolled
    * oracle ill-defined. */
  val SeedSize = 60
  val PruneSchedule: Seq[Int] = Seq(40, 25, 15)

  /** (word, cnt) over the documents table, capped at [[MaxWordLen]] —
    * the one corpus pass. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Candidate seed: every substring of length 1..[[MaxPieceLen]] of
    * every word, scored by occurrence count (per position, weighted by
    * word count); top [[SeedSize]] multi-char pieces + all single
    * chars. Vocab-bounded: the substring fan-out is ≤ MaxWordLen ×
    * MaxPieceLen per distinct word. */
  def seedVocab(words: DataFrame): DataFrame = {
    val subs = (1 to MaxPieceLen).map { l =>
      words.filter(length(col("word")) >= l)
        .select(col("cnt"), explode(expr(
          s"transform(sequence(1, length(word) - $l + 1), " +
            s"i -> substring(word, i, $l))")).as("piece"))
    }.reduce(_ unionByName _)
      .groupBy("piece").agg(sum(col("cnt")).as("score"))
    prune(subs, SeedSize)
  }

  /** Keep the top `keep` multi-char pieces (score desc, piece asc) plus
    * every single char — the fallback alphabet must survive pruning or
    * segmentation could fail. */
  private def prune(vocab: DataFrame, keep: Int): DataFrame =
    vocab.filter(length(col("piece")) >= 2)
      .orderBy(col("score").desc, col("piece").asc)
      .limit(keep)
      .unionByName(vocab.filter(length(col("piece")) === 1))

  /** The in-row Viterbi DP: forward over character positions, state per
    * position = (k pieces, −score sum, chosen pieces), transitions try
    * the 1..[[MaxPieceLen]]-char pieces ending at the position (multi-
    * char pieces must be in the vocab map `vm`; single chars are always
    * admissible at score 0 when unlisted, so the DP always completes).
    * Candidate order (k asc, negs asc, −l asc) = fewest pieces, largest
    * score, longest piece — unique per step, so the argmin is total.
    * Expects columns `word` and `vm: map<string,bigint>`. */
  private[graft] def segmentExpr: Column = expr(
    s"""aggregate(
       |  sequence(1, length(word)),
       |  array(named_struct(
       |    'k', 0, 'negs', CAST(0 AS BIGINT),
       |    'segs', CAST(array() AS array<string>))),
       |  (acc, i) -> acc || array(element_at(transform(slice(array_sort(
       |    transform(
       |      filter(sequence(1, least(i, $MaxPieceLen)),
       |        l -> l = 1 OR map_contains_key(vm, substring(word, i - l + 1, l))),
       |      l -> named_struct(
       |        'k', element_at(acc, i - l + 1).k + 1,
       |        'negs', element_at(acc, i - l + 1).negs
       |          - coalesce(element_at(vm, substring(word, i - l + 1, l)),
       |                     CAST(0 AS BIGINT)),
       |        'negl', -l,
       |        'segs', element_at(acc, i - l + 1).segs
       |          || array(substring(word, i - l + 1, l))))),
       |    1, 1), x -> named_struct('k', x.k, 'negs', x.negs, 'segs', x.segs)),
       |    1)),
       |  acc -> element_at(acc, -1).segs)""".stripMargin)

  /** E-step: Viterbi pieces for every word under `vocab` scores. The
    * vocab collapses to a 1-row map and broadcasts; the DP is one
    * projection over the word frame. */
  def segments(words: DataFrame, vocab: DataFrame): DataFrame = {
    val vm = vocab.agg(
      map_from_entries(collect_list(struct(col("piece"), col("score"))))
        .as("vm"))
    words.crossJoin(broadcast(vm))
      .select(col("word"), col("cnt"), segmentExpr.as("segs"))
  }

  /** M-step: usage-weighted piece counts from the segmentations. */
  private def usage(segs: DataFrame): DataFrame =
    segs.select(col("cnt"), explode(col("segs")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("score"))

  /** Run the EM loop: seed, then one (segment → re-score → prune) round
    * per [[PruneSchedule]] entry. Returns the final scored vocabulary. */
  def train(words: DataFrame): DataFrame =
    PruneSchedule.foldLeft(seedVocab(words)) { (vocab, keep) =>
      prune(usage(segments(words, vocab)), keep)
    }

  /** Session-cached trained vocabulary over the documents table at
    * `dir`, shared by the train/segment queries and the bench. */
  def trained(spark: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(spark, s"unigram:$dir") {
      train(SharedFrames.cached(spark, s"unigramwc:$dir") {
        wordCounts(graft.core.Tables.documents(spark, dir))
      })
    }

  /** Cached word frame (for the apply-side query). */
  def trainedWords(spark: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(spark, s"unigramwc:$dir") {
      wordCounts(graft.core.Tables.documents(spark, dir))
    }
}
