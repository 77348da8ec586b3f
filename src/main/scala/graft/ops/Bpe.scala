package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SharedFrames

/** Distributed BPE tokenizer training — the word-count formulation every
  * production trainer uses (count distinct words once, then iterate over
  * the vocab-bounded word frame, never the corpus).
  *
  * The reference pipeline tokenizes only by whitespace
  * (`hv_master_data/data/Hummingbird_990_Webscraper.py:201` splits
  * scraped text on spaces); BPE merge training is the natural extension
  * a training-data engine needs (SURVEY.md training-data extensions,
  * next to `q_bpe_pairs` which is the single-step candidate count).
  *
  * Algorithm (exactly the classic Sennrich et al. 2016 procedure):
  *  1. count words across the corpus (ONE corpus pass; everything after
  *     runs on the (word, cnt) frame, whose size is the vocabulary —
  *     Heaps-law sublinear in corpus size, so 100 TB of text trains over
  *     a few-GB word frame);
  *  2. represent each word as bracketed symbols `[h][e][l][l][o]` —
  *     brackets make "replace adjacent pair (a,b) with ab" a plain
  *     left-to-right non-overlapping string replace, which is BPE's
  *     greedy merge semantics, with no ambiguity: `[xx][a]` can never
  *     match a `[x][a]` pattern because the bracket structure disagrees;
  *  3. per round: count adjacent symbol pairs weighted by word count
  *     (vocab-bounded aggregation, map-side combined), take the argmax
  *     pair with (count desc, pair asc) tiebreak — a 1-row TakeOrdered
  *     pull, the same bounded driver collect as the IVF centroid seed —
  *     and rewrite every word's repr with one `replace`.
  *
  * Per-round cost at any corpus size: one vocab-frame aggregation plus a
  * narrow projection; the corpus is touched exactly once, in step 1.
  * Everything is exact integer counts + deterministic string rewriting,
  * so `rounds` Spark iterations replay bit-for-bit as `rounds` unrolled
  * SQL stages (the oracle in TokenizerQueries does exactly that).
  */
object Bpe {

  /** One training round's outcome: pair (w1, w2) merged, seen n times. */
  case class Merge(round: Int, w1: String, w2: String, n: Long)

  /** Fixed training horizon: like LPA's fixed rounds, a data-dependent
    * stopping rule ("until no pair repeats") would make the unrolled
    * oracle ill-defined; real trainers run to a fixed merge budget too. */
  val Rounds = 6

  private val mergeCache = TrieMap.empty[String, Seq[Merge]]

  private def cacheKey(spark: SparkSession, dir: String): String =
    s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}:$dir"

  /** (word, cnt) over the documents table — the one corpus pass. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** `[h][e][l][l][o]` initial representation. */
  private[ops] def initialRepr(wc: DataFrame): DataFrame =
    wc.withColumn("repr",
      concat(lit("["),
        concat_ws("][", transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))),
        lit("]")))

  /** Adjacent-pair counts over the current representation, weighted by
    * word count. Single-symbol words (fully merged) drop out — Spark's
    * `sequence(1, 0)` DESCENDS instead of returning empty, so the
    * size >= 2 guard is correctness, not just economy. */
  private[ops] def pairCounts(repr: DataFrame): DataFrame =
    repr.select(col("cnt"),
        split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\[").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("w1"),
            element_at(col("syms"), i + 1).as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(sum("cnt").as("n"))

  /** BYTE-LEVEL initial representation (GPT-2's byte-alphabet variant):
    * symbols are hex pairs of the word's UTF-8 bytes — a 256-symbol base
    * alphabet, so ANY UTF-8 input tokenizes with no UNK and no
    * supplementary-plane special case (char-level BPE treats an emoji as
    * one opaque symbol; byte-level merges INTO multi-byte symbols from
    * evidence). A merged symbol is the concatenation of its parts' hex,
    * so `unhex(concat(symbols))` round-trips to the word's exact bytes
    * (the TokenizerSpec law). Hex (not raw bytes) keeps every symbol
    * printable ASCII — the bracket machinery and the DuckDB oracle work
    * unchanged. */
  private[ops] def initialByteRepr(wc: DataFrame): DataFrame =
    wc.withColumn("hx", hex(encode(col("word"), "UTF-8")))
      .withColumn("repr",
        concat(lit("["),
          concat_ws("][", transform(
            sequence(lit(1), (length(col("hx")) / 2).cast("int")),
            i => col("hx").substr(i * lit(2) - 1, lit(2)))),
          lit("]")))
      .drop("hx")

  /** Train `rounds` merges over `docs`, returning the merge list and the
    * final (word, cnt, repr) frame. Pure function of the corpus. */
  def train(docs: DataFrame, rounds: Int): (Seq[Merge], DataFrame) =
    trainLoop(docs, rounds, initialRepr)

  /** Byte-level training: same merge loop over [[initialByteRepr]]. */
  def trainBytes(docs: DataFrame, rounds: Int): (Seq[Merge], DataFrame) =
    trainLoop(docs, rounds, initialByteRepr)

  private def trainLoop(docs: DataFrame, rounds: Int,
                        init: DataFrame => DataFrame): (Seq[Merge], DataFrame) = {
    val wc = SharedFrames.register(wordCounts(docs))
    var repr = init(wc)
    val merges = Seq.newBuilder[Merge]
    for (r <- 0 until rounds) {
      val best = pairCounts(repr)
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(1).collect()
      // a corpus can run dry (every word one symbol) before the budget
      if (best.nonEmpty) {
        val (w1, w2, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, w1, w2, n)
        repr = repr.withColumn("repr",
          replace(col("repr"), lit(s"[$w1][$w2]"), lit(s"[$w1$w2]")))
      }
    }
    (merges.result(), repr)
  }

  /** Session-cached training over the documents table at `dir`: the merge
    * list and the persisted final representation frame are built once and
    * shared by `q_bpe_train` / `q_bpe_segment` / the bench runner. */
  def trained(spark: SparkSession, dir: String): (Seq[Merge], DataFrame) = {
    val frame = SharedFrames.cached(spark, s"bpe:$dir") {
      val (m, f) = train(graft.core.Tables.documents(spark, dir), Rounds)
      mergeCache.put(cacheKey(spark, dir), m)
      f
    }
    (mergeCache(cacheKey(spark, dir)), frame)
  }

  /** Session-cached byte-level training (same discipline as [[trained]]). */
  def trainedBytes(spark: SparkSession, dir: String): (Seq[Merge], DataFrame) = {
    val frame = SharedFrames.cached(spark, s"bpebytes:$dir") {
      val (m, f) = trainBytes(graft.core.Tables.documents(spark, dir), Rounds)
      mergeCache.put(s"bytes:${cacheKey(spark, dir)}", m)
      f
    }
    (mergeCache(s"bytes:${cacheKey(spark, dir)}"), frame)
  }
}
