package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Bpe, Unigram, WordPiece}

/** Tokenizer-training queries: the iterative BPE merge loop
  * ([[graft.ops.Bpe]]) and its apply side. Extends the single-step
  * `q_bpe_pairs` candidate count into the full trainer a data pipeline
  * runs before tokenizing a corpus.
  *
  * Oracle discipline: the Spark side iterates `Bpe.Rounds` times; the
  * DuckDB oracle replays the SAME rounds as unrolled CTE stages (pair
  * count -> 1-row argmax -> replace), exactly the unrolled-fixpoint
  * pattern `q_pagerank` / `q_embed_pca` / `q_communities` use. Every
  * count is an exact integer and the merge apply is deterministic
  * left-to-right string replacement, so the replay is bit-for-bit.
  */
object TokenizerQueries extends QueryGroup {

  /** Trained merge table: one row per round. */
  private def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = Bpe.trained(s, dir)
    s.createDataFrame(merges)
      .select(col("round"), col("w1"), col("w2"), col("n"),
        concat(col("w1"), col("w2")).as("merged"))
      .orderBy("round")
  }

  /** Apply side: per-doc token/symbol/char counts under the trained
    * merges. The vocab-bounded (word -> n_syms) lookup broadcasts; the
    * corpus pass is one explode + broadcast join + doc aggregation. */
  private def bpeSegment(s: SparkSession, dir: String): DataFrame = {
    val (_, repr) = Bpe.trained(s, dir)
    val seg = repr.select(col("word"),
      size(split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\["))
        .as("n_syms"),
      length(col("word")).as("n_chars"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("n_syms").as("n_symbols"),
        sum("n_chars").as("n_chars"))
      .withColumn("chars_per_symbol",
        round(col("n_chars").cast("double") / col("n_symbols"), 6))
      .orderBy("doc_id")
  }

  /** Tokenizer-quality report: per language, how much of the corpus the
    * trained merges actually COVER — the fraction of word occurrences
    * fully merged to one symbol and the mean symbols per word (the
    * fertility metric tokenizer evaluations quote). A merge budget
    * trained on the corpus mix over-serves the dominant language; this
    * is the per-stratum view that exposes it. Rides the shared trained
    * repr frame; |langs|-row output. */
  private def bpeCoverage(s: SparkSession, dir: String): DataFrame =
    coverageFrom(Bpe.trained(s, dir)._2, s, dir)

  /** Byte-level coverage twin: same report over the byte-alphabet repr.
    * `coverage` here reads as the fraction of word occurrences the merge
    * budget compresses to ONE symbol from 1+ BYTES — strictly harder than
    * the char-level statistic for multi-byte scripts, which is exactly
    * the per-language skew this report exists to expose. */
  private def bpeBytesCoverage(s: SparkSession, dir: String): DataFrame =
    coverageFrom(Bpe.trainedBytes(s, dir)._2, s, dir)

  private def coverageFrom(repr: DataFrame, s: SparkSession,
                           dir: String): DataFrame = {
    val seg = repr.select(col("word"),
      size(split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\["))
        .as("n_syms"))
    Tables.documents(s, dir)
      .select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_occurrences"),
        sum(when(col("n_syms") === 1, 1L).otherwise(0L)).as("fully_merged"),
        sum("n_syms").as("n_symbols"))
      .select(col("lang"), col("n_occurrences"), col("fully_merged"),
        round(col("fully_merged").cast("double") / col("n_occurrences"), 6)
          .as("coverage"),
        round(col("n_symbols").cast("double") / col("n_occurrences"), 6)
          .as("symbols_per_word"))
      .orderBy("lang")
  }

  /** The ENCODE step — what a model actually consumes: every word's
    * symbol sequence under the trained merges mapped to integer token
    * ids from a frequency-ranked vocabulary (occurrence-weighted rank,
    * symbol-asc tiebreak — the id assignment real tokenizers ship).
    * Output is one row per (doc, word position, symbol): the token-id
    * stream, bounded to each doc's first [[EncodeMaxPos]] words so the
    * verification row count stays fixed per doc. Shapes: the vocab is
    * tiny by construction (distinct chars + merge budget), so its
    * ranking window sees ≤ |chars|+rounds rows and both lookup joins
    * broadcast; the corpus pass is one posexplode + two broadcast
    * joins — no data-sized shuffle anywhere. */
  private val EncodeMaxPos = 10
  private def bpeEncode(s: SparkSession, dir: String): DataFrame =
    encodeFrom(Bpe.trained(s, dir)._2, s, dir)

  /** Byte-level encode twin: the token-id stream a byte-BPE model
    * consumes — ids from the same occurrence-ranked assignment over the
    * byte-symbol vocabulary (256-bounded alphabet + merge budget, so the
    * ranking window and both broadcast lookups stay tiny). */
  private def bpeBytesEncode(s: SparkSession, dir: String): DataFrame =
    encodeFrom(Bpe.trainedBytes(s, dir)._2, s, dir)

  private def encodeFrom(repr: DataFrame, s: SparkSession,
                         dir: String): DataFrame = {
    val wordSyms = repr.select(col("word"), col("cnt"),
      split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\[").as("syms"))
    val vocab = wordSyms
      .select(col("cnt"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum("cnt").as("occ"))
    // deliberate partition-less window: the vocab frame is bounded by
    // |alphabet| + merge rounds (~40 rows), like the rank-offset cumsum
    val vw = Window.orderBy(col("occ").desc, col("symbol"))
    val vocabIds = vocab
      .withColumn("token_id", (row_number().over(vw) - 1).cast("int"))
      .select("symbol", "token_id")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "word")))
      .filter(col("word") =!= "" && col("p") < EncodeMaxPos)
      .join(broadcast(wordSyms.select("word", "syms")), Seq("word"))
      .select(col("doc_id"), (col("p") + 1).cast("int").as("pos"),
        posexplode(col("syms")).as(Seq("si", "symbol")))
      .join(broadcast(vocabIds), Seq("symbol"))
      .select(col("doc_id"), col("pos"),
        (col("si") + 1).cast("int").as("sym_idx"),
        col("token_id"), col("symbol"))
      .orderBy("doc_id", "pos", "sym_idx")
  }

  /** Unigram-LM trained vocabulary ([[graft.ops.Unigram]]): the EM
    * companion to `q_bpe_train` — seed substrings, 3 (Viterbi-segment →
    * re-score → prune) rounds under the float-free MDL objective, final
    * scored vocab with deterministic ranks. The oracle replays seed +
    * every EM round with the per-position DP unrolled as materialized
    * CTE stages — the `q_bpe_train` discipline, position-wise instead
    * of merge-wise. */
  private def unigramTrain(s: SparkSession, dir: String): DataFrame = {
    val vw = Window.orderBy(col("usage").desc, col("piece"))
    // deliberate partition-less window: the final vocab is bounded by
    // the prune schedule + alphabet (~60 rows)
    Unigram.trained(s, dir)
      .select(col("piece"), length(col("piece")).cast("int").as("n_chars"),
        col("score").as("usage"))
      .withColumn("rank", row_number().over(vw).cast("int"))
      .orderBy("rank")
  }

  /** Apply side: per-doc word/piece counts under the trained unigram
    * vocab — the fertility report ([[bpeSegment]]'s shape). The
    * word→pieces lookup is the Heaps-bounded word frame (broadcast);
    * words beyond the trainer's length cap drop out of the stats on
    * both sides. */
  private def unigramSegment(s: SparkSession, dir: String): DataFrame = {
    val seg = Unigram
      .segments(Unigram.trainedWords(s, dir), Unigram.trained(s, dir))
      .select(col("word"), size(col("segs")).as("n_pieces"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_pieces"))
      .withColumn("pieces_per_word",
        round(col("n_pieces").cast("double") / col("n_words"), 6))
      .orderBy("doc_id")
  }

  /** Model-ready token-id stream under the trained UNIGRAM vocabulary —
    * `q_bpe_encode`'s twin for the EM tokenizer: every in-cap word's
    * Viterbi pieces mapped to dense integer ids from the usage-ranked
    * vocab (score desc, piece tiebreak — the q_unigram_train rank minus
    * one). Both lookups broadcast (Heaps-bounded word frame, ~60-row
    * vocab); one corpus posexplode bounded at {{EncodeMaxPos}} positions
    * per doc. Words past the trainer's length cap drop from the stream
    * on both sides (same contract as the segment query); single-char
    * FALLBACK pieces the Viterbi DP emits for characters outside the
    * pruned vocabulary encode as UNK = −1 (the SentencePiece unk_id
    * convention) — an inner id join would silently cut them from the
    * stream and break losslessness (TokenizerSpec round-trip law). */
  private def unigramEncode(s: SparkSession, dir: String): DataFrame = {
    val segs = Unigram
      .segments(Unigram.trainedWords(s, dir), Unigram.trained(s, dir))
      .select("word", "segs")
    // deliberate partition-less window: vocab is prune-schedule-bounded
    val vw = Window.orderBy(col("score").desc, col("piece"))
    val vocabIds = Unigram.trained(s, dir)
      .withColumn("token_id", (row_number().over(vw) - 1).cast("int"))
      .select(col("piece"), col("token_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "word")))
      .filter(col("word") =!= "" && col("p") < EncodeMaxPos)
      .join(broadcast(segs), Seq("word"))
      .select(col("doc_id"), (col("p") + 1).cast("int").as("pos"),
        posexplode(col("segs")).as(Seq("si", "piece")))
      .join(broadcast(vocabIds), Seq("piece"), "left")
      .select(col("doc_id"), col("pos"),
        (col("si") + 1).cast("int").as("piece_idx"),
        coalesce(col("token_id"), lit(-1)).as("token_id"), col("piece"))
      .orderBy("doc_id", "pos", "piece_idx")
  }

  /** WordPiece trained merge table ([[graft.ops.WordPiece]]): one row
    * per round with the exact scaled likelihood-gain score — the BERT
    * trainer's argmax criterion next to `q_bpe_train`'s raw-frequency
    * one. The oracle replays the rounds as unrolled CTE stages with the
    * same HUGEINT-widened score arithmetic. */
  private def wordpieceTrain(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = WordPiece.trained(s, dir)
    s.createDataFrame(merges)
      .select(col("round"), col("w1"), col("w2"), col("n"),
        col("ca"), col("cb"), col("scoreScaled").as("score_scaled"),
        concat(col("w1"), col("w2")).as("merged"))
      .orderBy("round")
  }

  /** Apply side: per-doc fertility under greedy maximum-munch
    * segmentation with the trained WordPiece vocabulary — genuinely
    * different from `q_bpe_segment`'s merge replay (max-munch can pick
    * a longer piece than the merge order ever built at that position).
    * The greedy scan is IN-ROW ([[graft.ops.WordPiece.segmentExpr]]);
    * the oracle unrolls it position-wise, one stage per character, the
    * `q_unigram_segment` DP discipline. Words beyond the trainer's
    * length cap drop from the stats on both sides. */
  private def wordpieceSegment(s: SparkSession, dir: String): DataFrame = {
    val words = WordPiece.trainedWords(s, dir)
    val (_, repr) = WordPiece.trained(s, dir)
    val seg = WordPiece.segments(words, WordPiece.vocabulary(words, repr))
      .select(col("word"), col("n_pieces"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_pieces"))
      .withColumn("pieces_per_word",
        round(col("n_pieces").cast("double") / col("n_words"), 6))
      .orderBy("doc_id")
  }

  /** BYTE-LEVEL BPE trainer (GPT-2's byte-alphabet variant,
    * [[graft.ops.Bpe.trainBytes]]): the one production tokenizer shape
    * char-level BPE/WordPiece/Unigram miss — a 256-symbol byte alphabet,
    * so any UTF-8 input (emoji, non-BMP CJK, mixed scripts) tokenizes
    * with NO UNK and merges are learned across multi-byte characters
    * from evidence. Symbols are hex byte pairs (printable, oracle-exact);
    * TokenizerSpec pins the unhex round-trip law. Same merge-table shape
    * as q_bpe_train. */
  private def bpeBytesTrain(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = Bpe.trainedBytes(s, dir)
    s.createDataFrame(merges)
      .select(col("round"), col("w1"), col("w2"), col("n"),
        concat(col("w1"), col("w2")).as("merged"))
      .orderBy("round")
  }

  /** Apply side of the byte-level trainer: per-doc token/symbol/byte
    * counts (bytes-per-symbol is the byte-level fertility — the
    * compression-rate metric byte-BPE evaluations quote, next to
    * q_bpe_segment's chars-per-symbol). Same broadcast word-lookup
    * shape; NO length cap and no OOV drop-out — every whitespace word
    * joins because the byte alphabet covers all of UTF-8. */
  private def bpeBytesSegment(s: SparkSession, dir: String): DataFrame = {
    val (_, repr) = Bpe.trainedBytes(s, dir)
    val seg = repr.select(col("word"),
      size(split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\["))
        .as("n_syms"),
      (length(hex(encode(col("word"), "UTF-8"))) / 2).cast("long").as("n_bytes"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("n_syms").as("n_symbols"),
        sum("n_bytes").as("n_bytes"))
      .withColumn("bytes_per_symbol",
        round(col("n_bytes").cast("double") / col("n_symbols"), 6))
      .orderBy("doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_train" -> bpeTrain,
    "q_bpe_bytes" -> bpeBytesTrain,
    "q_bpe_bytes_segment" -> bpeBytesSegment,
    "q_bpe_bytes_coverage" -> bpeBytesCoverage,
    "q_bpe_bytes_encode" -> bpeBytesEncode,
    "q_bpe_segment" -> bpeSegment,
    "q_bpe_coverage" -> bpeCoverage,
    "q_bpe_encode" -> bpeEncode,
    "q_unigram_train" -> unigramTrain,
    "q_unigram_segment" -> unigramSegment,
    "q_unigram_encode" -> unigramEncode,
    "q_wordpiece_train" -> wordpieceTrain,
    "q_wordpiece_segment" -> wordpieceSegment,
  )

  override def shared: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq("bpe_repr" -> ((s, dir) => Bpe.trained(s, dir)._2),
      "bpe_bytes_repr" -> ((s, dir) => Bpe.trainedBytes(s, dir)._2),
      "unigram_vocab" -> ((s, dir) => Unigram.trained(s, dir)),
      "wordpiece_repr" -> ((s, dir) => WordPiece.trained(s, dir)._2))

  /** `r0` CTE for the byte-level variant: symbols are hex pairs of the
    * word's UTF-8 bytes (DuckDB `hex(word)` == Spark
    * `hex(encode(word, 'UTF-8'))` — both uppercase). The merge stages are
    * the char-level ones unchanged. */
  private val byteR0 =
    """r0 AS (
      |  SELECT word, cnt,
      |    '[' || array_to_string(
      |      list_transform(generate_series(1, length(hex(word)) // 2),
      |        i -> hex(word)[i*2-1 : i*2]),
      |      '][') || ']' AS repr
      |  FROM wc)""".stripMargin

  /** Coverage-report oracle body, shared by the char- and byte-level
    * variants (they differ only in the training prefix's `r0`). */
  private def coverageOracle(prefix: String, k: Int): String =
    s"""$prefix,
       |seg AS (
       |  SELECT word, len(string_split(repr[2:-2], '][')) AS n_syms
       |  FROM r$k),
       |dt AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents)
       |SELECT lang,
       |  count(*) AS n_occurrences,
       |  CAST(sum(CASE WHEN n_syms = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fully_merged,
       |  round(CAST(sum(CASE WHEN n_syms = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS coverage,
       |  round(CAST(sum(n_syms) AS DOUBLE) / count(*), 6) AS symbols_per_word
       |FROM dt JOIN seg USING (word)
       |WHERE word <> ''
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Encode oracle body (token-id stream), shared by the char- and
    * byte-level variants. */
  private def encodeOracle(prefix: String, k: Int): String =
    s"""$prefix,
       |ws AS (SELECT word, cnt, string_split(repr[2:-2], '][') AS syms
       |       FROM r$k),
       |voc AS (
       |  SELECT syms[i] AS symbol, CAST(sum(cnt) AS BIGINT) AS occ
       |  FROM ws, unnest(generate_series(1, len(syms))) AS t(i)
       |  GROUP BY 1),
       |vid AS (
       |  SELECT symbol,
       |    CAST(row_number() OVER (ORDER BY occ DESC, symbol) - 1
       |      AS INTEGER) AS token_id
       |  FROM voc),
       |dt AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS pos, words[i] AS word
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
       |        FROM documents),
       |       unnest(generate_series(1, len(words))) AS t(i)
       |  WHERE words[i] <> '' AND i <= $EncodeMaxPos),
       |enc AS (
       |  SELECT doc_id, pos, syms,
       |    unnest(generate_series(1, len(syms))) AS si
       |  FROM dt JOIN ws USING (word))
       |SELECT doc_id, pos, CAST(si AS INTEGER) AS sym_idx,
       |  token_id, syms[si] AS symbol
       |FROM enc JOIN vid ON syms[si] = vid.symbol
       |ORDER BY doc_id, pos, sym_idx""".stripMargin

  /** WITH-prefix replaying the training loop: wc -> r0, then per round
    * p{r} (pair counts) / b{r} (argmax) / r{r+1} (merge applied).
    * `r0Override` swaps the initial representation (byte-level). */
  private def bpeSqlPrefix(rounds: Int, r0Override: Option[String] = None): String = {
    val head =
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents),
        |wc AS (SELECT word, count(*) AS cnt FROM tok WHERE word <> '' GROUP BY 1),
        |""".stripMargin + r0Override.getOrElse(
      """r0 AS (
        |  SELECT word, cnt,
        |    '[' || array_to_string(
        |      list_transform(generate_series(1, length(word)), i -> word[i]),
        |      '][') || ']' AS repr
        |  FROM wc)""".stripMargin)
    val stages = (0 until rounds).map { r =>
      s"""p$r AS (
         |  SELECT syms[i] AS w1, syms[i+1] AS w2, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, string_split(repr[2:-2], '][') AS syms FROM r$r),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT w1, w2, n FROM p$r ORDER BY n DESC, w1, w2 LIMIT 1),
         |r${r + 1} AS (
         |  SELECT word, cnt,
         |    replace(repr, '[' || b.w1 || '][' || b.w2 || ']',
         |                  '[' || b.w1 || b.w2 || ']') AS repr
         |  FROM r$r, b$r b)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  /** DuckDB replay of one unigram E-step: the per-word Viterbi DP
    * unrolled position-wise — stage `s{r}_{d}` holds the best state for
    * every word of length ≥ d (fewest pieces, then largest score, then
    * longest piece: ORDER BY k, negs, negl under QUALIFY), built from
    * the ≤ [[graft.ops.Unigram.MaxPieceLen]] prior stages. MATERIALIZED
    * is load-bearing: each stage is referenced by up to 4 later ones
    * and plain CTE inlining would re-expand the upstream tree
    * exponentially (the q_kcore lesson). */
  private def unigramDpSql(r: Int): String = {
    val L = Unigram.MaxWordLen
    val P = Unigram.MaxPieceLen
    val s0 =
      s"""s${r}_0 AS MATERIALIZED (
         |  SELECT word, cnt, wl, 0 AS k, CAST(0 AS BIGINT) AS negs,
         |         CAST([] AS VARCHAR[]) AS segs
         |  FROM uwords)""".stripMargin
    val stages = (1 to L).map { d =>
      val l1 =
        s"""    SELECT p.word, p.cnt, p.wl, p.k + 1 AS k,
           |      p.negs - coalesce(v.score, 0) AS negs, -1 AS negl,
           |      list_append(p.segs, p.word[$d:$d]) AS segs
           |    FROM s${r}_${d - 1} p
           |    LEFT JOIN v${r - 1} v ON v.piece = p.word[$d:$d]
           |    WHERE p.wl >= $d""".stripMargin
      val rest = (2 to math.min(P, d)).map { l =>
        s"""    SELECT p.word, p.cnt, p.wl, p.k + 1, p.negs - v.score, -$l,
           |      list_append(p.segs, p.word[${d - l + 1}:$d])
           |    FROM s${r}_${d - l} p
           |    JOIN v${r - 1} v ON v.piece = p.word[${d - l + 1}:$d]
           |    WHERE p.wl >= $d""".stripMargin
      }
      s"""s${r}_$d AS MATERIALIZED (
         |  SELECT word, cnt, wl, k, negs, segs FROM (
         |${(l1 +: rest).mkString("\n    UNION ALL\n")}
         |  ) QUALIFY row_number() OVER (PARTITION BY word ORDER BY k, negs, negl) = 1)""".stripMargin
    }
    val seg =
      s"""seg$r AS MATERIALIZED (
         |  SELECT word, cnt, segs FROM (
         |${(1 to L).map(d => s"    SELECT word, cnt, segs FROM s${r}_$d WHERE wl = $d")
          .mkString("\n    UNION ALL\n")}
         |  ))""".stripMargin
    (s0 +: stages :+ seg).mkString(",\n")
  }

  /** WITH-prefix replaying unigram training: word counts (length-capped)
    * → substring seed → per round the DP stages + usage re-score +
    * prune-keeping-singles. `rounds` EM rounds leave vocab `v{rounds}`
    * and segmentations `seg{r}`. */
  private def unigramSqlPrefix(rounds: Int): String = {
    val L = Unigram.MaxWordLen
    val P = Unigram.MaxPieceLen
    def pruneSql(src: String, name: String, keep: Int): String =
      s"""$name AS MATERIALIZED (
         |  SELECT piece, score FROM (
         |    SELECT piece, score FROM $src WHERE length(piece) >= 2
         |    ORDER BY score DESC, piece LIMIT $keep)
         |  UNION ALL
         |  SELECT piece, score FROM $src WHERE length(piece) = 1)""".stripMargin
    val head =
      s"""WITH utok AS (
         |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
         |  FROM documents),
         |uwc AS (SELECT word, count(*) AS cnt FROM utok WHERE word <> '' GROUP BY 1),
         |uwords AS MATERIALIZED (
         |  SELECT word, cnt, length(word) AS wl FROM uwc WHERE length(word) <= $L),
         |usd AS MATERIALIZED (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS score FROM (
         |${(1 to P).map(l =>
            s"    SELECT w.word[i:i+${l - 1}] AS piece, cnt FROM uwords w, " +
              s"unnest(generate_series(1, w.wl - ${l - 1})) AS t(i)")
          .mkString("\n    UNION ALL\n")}
         |  ) GROUP BY 1),
         |${pruneSql("usd", "v0", Unigram.SeedSize)}""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      s"""${unigramDpSql(r)},
         |u$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS score
         |  FROM (SELECT cnt, unnest(segs) AS piece FROM seg$r) GROUP BY 1),
         |${pruneSql(s"u$r", s"v$r", Unigram.PruneSchedule(r - 1))}""".stripMargin
    }
    (head +: roundsSql).mkString(",\n")
  }

  /** WITH-prefix replaying WordPiece training: length-capped word
    * counts → bracketed repr, then per round symbol counts `wps{r}` /
    * pair counts `wpp{r}` / likelihood-gain argmax `wpb{r}` (HUGEINT-
    * widened exact score) / merge applied `wpr{r+1}`. */
  private def wpSqlPrefix(rounds: Int): String = {
    val head =
      s"""WITH wptok AS (
         |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
         |  FROM documents),
         |wpwc AS MATERIALIZED (
         |  SELECT word, count(*) AS cnt FROM wptok
         |  WHERE word <> '' AND length(word) <= ${WordPiece.MaxWordLen}
         |  GROUP BY 1),
         |wpr0 AS (
         |  SELECT word, cnt,
         |    '[' || array_to_string(
         |      list_transform(generate_series(1, length(word)), i -> word[i]),
         |      '][') || ']' AS repr
         |  FROM wpwc)""".stripMargin
    val stages = (0 until rounds).map { r =>
      s"""wpx$r AS MATERIALIZED (
         |  SELECT cnt, string_split(repr[2:-2], '][') AS syms FROM wpr$r),
         |wps$r AS MATERIALIZED (
         |  SELECT syms[i] AS sym, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM wpx$r, unnest(generate_series(1, len(syms))) AS t(i)
         |  GROUP BY 1),
         |wpp$r AS (
         |  SELECT syms[i] AS w1, syms[i+1] AS w2, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM wpx$r, unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |wpb$r AS (
         |  SELECT w1, w2, n, a.c AS ca, b.c AS cb,
         |    CAST((1000000000000 * CAST(n AS HUGEINT))
         |      // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS score_scaled
         |  FROM wpp$r JOIN wps$r a ON a.sym = w1 JOIN wps$r b ON b.sym = w2
         |  ORDER BY score_scaled DESC, w1, w2 LIMIT 1),
         |wpr${r + 1} AS (
         |  SELECT word, cnt,
         |    replace(repr, '[' || b.w1 || '][' || b.w2 || ']',
         |                  '[' || b.w1 || b.w2 || ']') AS repr
         |  FROM wpr$r, wpb$r b)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  /** DuckDB replay of the greedy maximum-munch scan, unrolled one stage
    * per character position: `wpg{d}` advances exactly the words whose
    * cursor sits at position d (longest vocab piece wins, single-char
    * fallback), everything else carries. */
  private def wpGreedySql(rounds: Int): String = {
    val L = WordPiece.MaxWordLen
    val voc =
      s"""wpvoc AS MATERIALIZED (
         |  SELECT DISTINCT piece FROM (
         |    SELECT unnest(string_split(repr[2:-2], '][')) AS piece FROM wpr$rounds
         |    UNION ALL
         |    SELECT word[i:i] AS piece
         |    FROM wpwc, unnest(generate_series(1, length(word))) AS t(i))),
         |wpg0 AS (
         |  SELECT word, cnt, length(word) AS wl, 1 AS pos, 0 AS np FROM wpwc)""".stripMargin
    val stages = (1 to L).map { d =>
      s"""wpg$d AS MATERIALIZED (
         |  SELECT word, cnt, wl, pos, np FROM wpg${d - 1}
         |  WHERE pos <> $d OR $d > wl
         |  UNION ALL
         |  SELECT g.word, g.cnt, g.wl,
         |    $d + coalesce(max(length(v.piece)), 1) AS pos, g.np + 1 AS np
         |  FROM wpg${d - 1} g LEFT JOIN wpvoc v
         |    ON $d + length(v.piece) - 1 <= g.wl
         |   AND v.piece = g.word[$d:$d + length(v.piece) - 1]
         |  WHERE g.pos = $d AND $d <= g.wl
         |  GROUP BY g.word, g.cnt, g.wl, g.np)""".stripMargin
    }
    (voc +: stages).mkString(",\n")
  }

  override def oracle: Map[String, String] = {
    val k = Bpe.Rounds
    val mergeRows = (0 until k)
      .map(r => s"SELECT $r AS round, w1, w2, n, w1 || w2 AS merged FROM b$r")
      .mkString("\nUNION ALL ")
    Map(
      "q_bpe_train" ->
        s"""${bpeSqlPrefix(k)}
           |SELECT * FROM ($mergeRows) ORDER BY round""".stripMargin,

      "q_bpe_bytes" ->
        s"""${bpeSqlPrefix(k, Some(byteR0))}
           |SELECT * FROM ($mergeRows) ORDER BY round""".stripMargin,

      "q_bpe_bytes_segment" ->
        s"""${bpeSqlPrefix(k, Some(byteR0))},
           |seg AS (
           |  SELECT word, len(string_split(repr[2:-2], '][')) AS n_syms,
           |         length(hex(word)) // 2 AS n_bytes
           |  FROM r$k),
           |dt AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
           |  FROM documents)
           |SELECT doc_id,
           |  count(*) AS n_tokens,
           |  CAST(sum(n_syms) AS BIGINT) AS n_symbols,
           |  CAST(sum(s.n_bytes) AS BIGINT) AS n_bytes,
           |  round(CAST(sum(s.n_bytes) AS DOUBLE) / CAST(sum(n_syms) AS BIGINT), 6)
           |    AS bytes_per_symbol
           |FROM dt JOIN seg s USING (word)
           |WHERE word <> ''
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_bpe_segment" ->
        s"""${bpeSqlPrefix(k)},
           |seg AS (
           |  SELECT word, len(string_split(repr[2:-2], '][')) AS n_syms,
           |         length(word) AS n_chars
           |  FROM r$k),
           |dt AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
           |  FROM documents)
           |SELECT doc_id,
           |  count(*) AS n_tokens,
           |  CAST(sum(n_syms) AS BIGINT) AS n_symbols,
           |  CAST(sum(s.n_chars) AS BIGINT) AS n_chars,
           |  round(CAST(sum(s.n_chars) AS DOUBLE) / CAST(sum(n_syms) AS BIGINT), 6)
           |    AS chars_per_symbol
           |FROM dt JOIN seg s USING (word)
           |WHERE word <> ''
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_bpe_encode" -> encodeOracle(bpeSqlPrefix(k), k),

      "q_bpe_bytes_encode" -> encodeOracle(bpeSqlPrefix(k, Some(byteR0)), k),

      "q_bpe_bytes_coverage" ->
        coverageOracle(bpeSqlPrefix(k, Some(byteR0)), k),

      "q_bpe_coverage" -> coverageOracle(bpeSqlPrefix(k), k),

      "q_unigram_train" -> {
        val r = Unigram.PruneSchedule.size
        s"""${unigramSqlPrefix(r)}
           |SELECT piece, CAST(length(piece) AS INTEGER) AS n_chars,
           |  score AS usage,
           |  CAST(row_number() OVER (ORDER BY score DESC, piece) AS INTEGER)
           |    AS rank
           |FROM v$r ORDER BY rank""".stripMargin
      },

      // one more DP pass under the FINAL vocab (stage r+1), then the
      // per-doc fertility rollup; words past the trainer's length cap
      // drop out of the join on both sides
      "q_unigram_segment" -> {
        val r = Unigram.PruneSchedule.size
        s"""${unigramSqlPrefix(r)},
           |${unigramDpSql(r + 1)},
           |useg AS (SELECT word, len(segs) AS np FROM seg${r + 1}),
           |dt AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
           |  FROM documents)
           |SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(np) AS BIGINT) AS n_pieces,
           |  round(CAST(sum(np) AS DOUBLE) / count(*), 6) AS pieces_per_word
           |FROM dt JOIN useg USING (word)
           |WHERE word <> ''
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },

      // one more DP pass under the final vocab, ids from the train rank
      "q_unigram_encode" -> {
        val r = Unigram.PruneSchedule.size
        s"""${unigramSqlPrefix(r)},
           |${unigramDpSql(r + 1)},
           |uvid AS (
           |  SELECT piece,
           |    CAST(row_number() OVER (ORDER BY score DESC, piece) - 1
           |      AS INTEGER) AS token_id
           |  FROM v$r),
           |useg AS (SELECT word, segs FROM seg${r + 1}),
           |udt AS (
           |  SELECT doc_id, CAST(i AS INTEGER) AS pos, words[i] AS word
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
           |        FROM documents),
           |       unnest(generate_series(1, len(words))) AS t(i)
           |  WHERE words[i] <> '' AND i <= $EncodeMaxPos),
           |uenc AS (
           |  SELECT doc_id, pos, segs,
           |    unnest(generate_series(1, len(segs))) AS si
           |  FROM udt JOIN useg USING (word))
           |SELECT doc_id, pos, CAST(si AS INTEGER) AS piece_idx,
           |  coalesce(token_id, -1) AS token_id, segs[si] AS piece
           |FROM uenc LEFT JOIN uvid ON segs[si] = uvid.piece
           |ORDER BY doc_id, pos, piece_idx""".stripMargin
      },

      "q_wordpiece_train" -> {
        val wk = WordPiece.Rounds
        val mergeRows = (0 until wk)
          .map(r => s"SELECT $r AS round, w1, w2, n, ca, cb, score_scaled, " +
            s"w1 || w2 AS merged FROM wpb$r")
          .mkString("\nUNION ALL ")
        s"""${wpSqlPrefix(wk)}
           |SELECT * FROM ($mergeRows) ORDER BY round""".stripMargin
      },

      "q_wordpiece_segment" -> {
        val wk = WordPiece.Rounds
        s"""${wpSqlPrefix(wk)},
           |${wpGreedySql(wk)},
           |wpseg AS (SELECT word, np FROM wpg${WordPiece.MaxWordLen}),
           |wpdt AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
           |  FROM documents)
           |SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(np) AS BIGINT) AS n_pieces,
           |  round(CAST(sum(np) AS DOUBLE) / count(*), 6) AS pieces_per_word
           |FROM wpdt JOIN wpseg USING (word)
           |WHERE word <> ''
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
    )
  }
}
