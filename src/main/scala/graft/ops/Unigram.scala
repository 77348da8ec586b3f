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
    // persisted: prune reads its input twice (top-piece ∪ single-char
    // branches) and the substring fan-out is the expensive subtree
    val subs = SharedFrames.register(
      (1 to MaxPieceLen).map { l =>
        words.filter(length(col("word")) >= l)
          .select(col("cnt"), explode(expr(
            s"transform(sequence(1, length(word) - $l + 1), " +
              s"i -> substring(word, i, $l))")).as("piece"))
      }.reduce(_ unionByName _)
        .groupBy("piece").agg(sum(col("cnt")).as("score")))
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
    * position = (k pieces, −score sum, backpointer), transitions try
    * the 1..[[MaxPieceLen]]-char pieces ending at the position (multi-
    * char pieces must be in the vocab map `vm`; single chars are always
    * admissible at score 0 when unlisted, so the DP always completes).
    * Candidate order (k asc, negs asc, −l asc) = fewest pieces, largest
    * score, longest piece — each candidate has a distinct l, so the
    * 3-key order is total and the argmin unique.
    *
    * The state carries only the chosen piece LENGTH (`bp`), not the
    * piece list: carrying the list meant every DP step copied the
    * prefix's whole string array into each candidate (O(len²) string
    * copies per word — this one projection was the most expensive
    * shared-frame build in the bench). The finish lambda walks the
    * backpointers once (≤ len steps) and rebuilds the same segmentation.
    * Expects columns `word` and `vm: map<string,bigint>`. */
  private[graft] def segmentExpr: Column = expr(
    s"""aggregate(
       |  sequence(1, length(word)),
       |  array(named_struct('k', 0, 'negs', CAST(0 AS BIGINT), 'bp', 0)),
       |  (acc, i) -> acc || array(element_at(transform(slice(array_sort(
       |    transform(
       |      filter(sequence(1, least(i, $MaxPieceLen)),
       |        l -> l = 1 OR map_contains_key(vm, substring(word, i - l + 1, l))),
       |      l -> named_struct(
       |        'k', element_at(acc, i - l + 1).k + 1,
       |        'negs', element_at(acc, i - l + 1).negs
       |          - coalesce(element_at(vm, substring(word, i - l + 1, l)),
       |                     CAST(0 AS BIGINT)),
       |        'negl', -l))),
       |    1, 1), x -> named_struct('k', x.k, 'negs', x.negs, 'bp', -x.negl)),
       |    1)),
       |  acc -> aggregate(
       |    sequence(1, length(word)),
       |    named_struct('pos', length(word),
       |      'segs', CAST(array() AS array<string>)),
       |    (st, j) -> IF(st.pos <= 0, st, named_struct(
       |      'pos', st.pos - element_at(acc, st.pos + 1).bp,
       |      'segs', array(substring(word,
       |          st.pos - element_at(acc, st.pos + 1).bp + 1,
       |          element_at(acc, st.pos + 1).bp)) || st.segs)),
       |    st -> st.segs))""".stripMargin)

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
    * per [[PruneSchedule]] entry. Returns the final scored vocabulary.
    *
    * Each round's vocabulary is COLLECTED to the driver (≤ [[SeedSize]] +
    * alphabet rows by construction — the same bounded-pull discipline as
    * the IVF centroid seeds) and fed to the next round as a map literal.
    * The previous lazy fold chained every round into one plan in which
    * [[prune]] references its input twice (top-piece branch ∪ single-char
    * branch), so round N's subtree was re-evaluated once per downstream
    * reference — a fan-out that grew per round and made this build the
    * most expensive shared frame in the bench. With the per-round
    * collect, every EM round is exactly ONE distributed pass over the
    * word frame, and the vocab map rides into the segmentation as a
    * literal (no broadcast join at all). Driver-side pruning compares
    * pieces by UTF-8 bytes — the ordering `col.asc` applies — not by
    * Java's UTF-16 code units, which diverge beyond the BMP. */
  def train(words: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val utf8Asc: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var vocab: Seq[(String, Long)] = seedVocab(words).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    for (keep <- PruneSchedule) {
      val segs = words
        .withColumn("vm", typedlit(vocab.toMap))
        .select(col("cnt"), segmentExpr.as("segs"))
      val used = segs.select(col("cnt"), explode(col("segs")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("score"))
        .collect() // bounded: usage pieces ⊆ current vocab
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      // piece length in CODE POINTS, not Java UTF-16 code units: the
      // distributed seed prune, segmentExpr substrings, and the oracle all
      // count code points, so a supplementary-plane char (emoji, non-BMP
      // CJK; Java length 2) must take the always-kept single-char branch —
      // String.length would route it through the keep cutoff and break the
      // alphabet-survives-pruning invariant on non-BMP corpora
      def cpLen(p: String): Int = p.codePointCount(0, p.length)
      vocab = used.filter(u => cpLen(u._1) >= 2)
        .sortBy { case (p, s) => (-s, p) }(
          Ordering.Tuple2(Ordering.Long, utf8Asc)).take(keep) ++
        used.filter(u => cpLen(u._1) == 1)
    }
    vocab.toDF("piece", "score")
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
