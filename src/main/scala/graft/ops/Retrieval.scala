package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus: BM25 scoring with exact
  * integer arithmetic, block-delta inverted-index statistics, positional
  * phrase match, and incremental (batch-vs-index) maintenance of both —
  * the query-side companion to the curation operators (a training-data
  * pipeline retrieves near-matches of eval prompts, mines hard negatives,
  * and sizes its index before shipping it).
  *
  * Reference analog: the dashboard's substring search + ranked results
  * (`master_map2.html:304–370`) is the reference's only retrieval
  * surface; this is the corpus-scale form.
  */
object Retrieval {

  /** Per-(doc, token) term frequencies — whitespace tokens, the corpus
    * tokenization idiom (`\S+`, same as the hash-embedding features).
    * One explode + one map-side-combined aggregation. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))

  /** Positional postings (doc_id, tok, pos) with 1-based token position —
    * the payload a phrase/proximity query needs that bag-of-words
    * postings can't answer. Same tokenizer as [[termFrequencies]]; one
    * posexplode, no aggregation (positions are already unique per doc). */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos0", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("tok"), (col("pos0") + 1).as("pos"))

  /** Materialized BM25 index artifacts — what a shipped index persists,
    * and what [[mergeBm25Index]] maintains incrementally:
    *  - `tf`    postings (doc_id, tok, tf)
    *  - `dl`    per-doc lengths (doc_id, dl)
    *  - `df`    per-term document frequencies (tok, df)
    *  - `stats` 1-row corpus totals (n docs, t_total tokens) */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame,
                             df: DataFrame, stats: DataFrame)

  /** Build the full index from a document frame (or a pre-computed tf). */
  def buildBm25Index(docs: DataFrame,
                     tfOpt: Option[DataFrame] = None): Bm25Index = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(coalesce(sum(col("dl")), lit(0L)).as("t_total")))
    Bm25Index(tf, dl, df_, stats)
  }

  /** Incremental index maintenance: fold a NEW batch of documents into an
    * existing index WITHOUT rescanning the indexed corpus — only the
    * delta is tokenized; postings and doc lengths append (doc ids are
    * disjoint), df merges by term, and the 1-row stats add. At 100 TB a
    * per-batch index rebuild is the exact anti-pattern the incremental
    * dedup/ANN paths avoid; this is the retrieval-side analog of the
    * reference's checkpoint/resume append pipeline
    * (`chat_acreage_bot.py:793–837`). Result is law-equal to
    * [[buildBm25Index]] over base ∪ delta (RetrievalSpec). */
  def mergeBm25Index(base: Bm25Index, deltaDocs: DataFrame,
                     dTfOpt: Option[DataFrame] = None): Bm25Index = {
    // dTfOpt: a pre-computed delta tf (the caller may already hold the
    // batch's postings — e.g. a session-shared tf restricted to the batch
    // ids); without it the merged plan re-tokenizes the delta once per
    // artifact that reads it (tf twice, dl/df/stats once each)
    val dTf = dTfOpt.getOrElse(termFrequencies(deltaDocs))
    val dDl = dTf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dDf = dTf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dStats = deltaDocs.agg(count(lit(1)).as("n"))
      .crossJoin(dDl.agg(coalesce(sum(col("dl")), lit(0L)).as("t_total")))
    Bm25Index(
      base.tf.unionByName(dTf),
      base.dl.unionByName(dDl),
      base.df.unionByName(dDf).groupBy("tok").agg(sum(col("df")).as("df")),
      base.stats.unionByName(dStats)
        .agg(sum(col("n")).as("n"), sum(col("t_total")).as("t_total")))
  }

  /** Corpus-derived deterministic query terms: each doc matching
    * `queryPred` contributes its `nTerms` highest-tf tokens (tf desc,
    * tok asc) as a query. queries·nTerms rows — broadcast-sized. */
  private def queryTerms(tf: DataFrame, queryPred: Column,
                         nTerms: Int): DataFrame = {
    val qw = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("tok").asc)
    tf.filter(queryPred)
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= nTerms)
      .select(col("doc_id").as("query_id"), col("tok"))
  }

  /** BM25 scoring against a (possibly incrementally-maintained) index,
    * EXACT: the log-free rational-idf BM25 variant
    * (idf = (N − df + ½)/(df + ½) instead of its log — the same
    * document ordering within a single-term query and a deterministic,
    * integer-exact score for multi-term ones), with k1 = 6/5 and b = 3/4
    * so every factor is rational. Multiplying the tf-saturation term
    * through by 10·T (T = total corpus tokens) makes the whole per-term
    * contribution one integer division:
    *
    *   contrib = (2(N−df)+1) · 22·tf·T · 10^6
    *             div [ (2df+1) · (10·tf·T + 3·T + 9·dl·N) ]
    *
    * — DECIMAL(38,0) interiors (N·T products pass 2^63 far below corpus
    * scale), one floored division per (query-term, doc), and a BIGINT
    * score that ranks without ever touching a float.
    *
    * Shape at scale: the query-term list is queries·nTerms rows →
    * BROADCAST against the tf frame (the postings probe is a
    * broadcast-hash join, the corpus side never shuffles for it); the
    * df broadcast is SEMI-JOIN-PRUNED to the query tokens first — the
    * full-vocabulary frame (1e8+ terms on a web corpus) would blow the
    * broadcast limit, and Catalyst cannot prune it to the probe's
    * tokens on its own. The dl join is the ONE corpus-cardinality
    * exchange in the pipeline (dl is a narrow two-column frame, and
    * only the matched postings shuffle to meet it); per-(query, doc)
    * scores then aggregate map-side. */
  def bm25ScoresFromIndex(idx: Bm25Index, queryPred: Column,
                          nTerms: Int = 5): DataFrame =
    bm25TermContribs(idx, queryPred, nTerms)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c")).as("score"))

  /** The pre-aggregation (query_id, tok, doc_id, c) contribution frame —
    * [[bm25ScoresFromIndex]] sums it per (query, doc); [[maxScorePrune]]
    * maxes it per (query, term) for the impact upper bounds. Same probe
    * shape either way (see the scoring scaladoc above). */
  def bm25TermContribs(idx: Bm25Index, queryPred: Column,
                       nTerms: Int = 5): DataFrame =
    bm25TermContribsFromTerms(idx, queryTerms(idx.tf, queryPred, nTerms))

  /** Same probe from an EXPLICIT (query_id, tok) term frame — the entry
    * point query expansion needs (its second pass scores a term set no
    * predicate derives). */
  def bm25TermContribsFromTerms(idx: Bm25Index, qt: DataFrame): DataFrame = {
    val qdf = idx.df.join(qt.select("tok").distinct(), Seq("tok"), "left_semi")
    idx.tf
      .join(broadcast(qt), Seq("tok"))
      .join(broadcast(qdf), Seq("tok"))
      .join(idx.dl, Seq("doc_id"))
      .crossJoin(broadcast(idx.stats))
      .withColumn("c", expr(
        """(CAST(2 * (n - df) + 1 AS DECIMAL(38,0)) * 22 * tf * t_total * 1000000)
          |div (CAST(2 * df + 1 AS DECIMAL(38,0)) *
          |     (10 * tf * t_total + 3 * t_total + 9 * dl * n))""".stripMargin))
      .select("query_id", "tok", "doc_id", "c")
  }

  /** MaxScore pruning report (Turtle & Flood 1995; the impact-ordering
    * statistic every production retrieval engine precomputes): per query
    * term, the UPPER BOUND of its BM25 contribution over its posting
    * list; terms whose ascending-bound prefix sums stay STRICTLY below
    * the top-k heap floor are "non-essential" — a document containing
    * only those terms provably cannot enter the top-k (its score is at
    * most the prefix bound sum), so a scorer skips their postings except
    * where an essential term already hit. The report quantifies the
    * skip: per query, how many of the matched postings a MaxScore
    * traversal never touches.
    *
    * Strict < on purpose: at cum == threshold a doc could still tie the
    * heap floor and enter on the doc_id tiebreak. All arithmetic stays
    * on exact BIGINTs (bounds and thresholds are the integer BM25
    * scores; skip_pct's postings·100 product is bounded by corpus
    * postings — ~1e14 at 100 TB — times 100, far under 2^63).
    *
    * Shape at scale: bounds aggregate the SAME probe frame the scores
    * use (map-side max per (query, term)), the threshold is the
    * bounded-heap top-k's floor, and the cum-bound window runs over the
    * ≤ queries·nTerms bound frame — nothing corpus-sized reaches the
    * window. RetrievalSpec pins the safety law: every top-k doc
    * contains at least one essential term. */
  def maxScorePrune(contribs: DataFrame, scored: DataFrame,
                    k: Int = 10): DataFrame = {
    val thr = bm25TopKFromScores(scored, k)
      .groupBy("query_id").agg(min(col("score")).as("threshold"))
    val bounds = contribs.groupBy("query_id", "tok")
      .agg(max(col("c")).as("ub"), count(lit(1)).as("postings"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ub").asc, col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .join(broadcast(thr), Seq("query_id"))
      .withColumn("cum_ub", sum(col("ub")).over(w))
      .withColumn("ne", col("cum_ub") < col("threshold"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("ne"), 1L).otherwise(0L)).as("n_nonessential"),
        sum(col("postings")).as("postings_total"),
        sum(when(col("ne"), col("postings")).otherwise(0L))
          .as("postings_skippable"),
        min(col("threshold")).as("threshold"))
      .withColumn("skip_pct",
        expr("(postings_skippable * 100) div postings_total"))
  }

  def bm25Scores(docs: DataFrame, queryPred: Column, nTerms: Int = 5,
                 tfOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(
      graft.core.SharedFrames.register(termFrequencies(docs)))
    bm25ScoresFromIndex(buildBm25Index(docs, Some(tf)), queryPred, nTerms)
  }

  /** Top-k cut over [[bm25ScoresFromIndex]] output: the bounded-heap
    * [[graft.functions.TopK.topKLongPayload]] aggregate — k rows per
    * query survive the exchange, the BIGINT score ranks EXACTLY (a
    * double-keyed heap would collapse distinct scores above 2^53, which
    * idf ~ 0.67·N crosses around N ~ 1e10 docs), and n_terms_hit rides
    * the heap as an inert payload, so the cut is ONE aggregation: the
    * former join-back to the scores frame (a second read that forced the
    * scores persisted — one more pass at 100 TB, one more exchange +
    * broadcast per call site at bench scale) is gone, and with it the
    * persist-until-clear contract this scaladoc used to carry. */
  def bm25TopKFromScores(scored0: DataFrame, k: Int = 10): DataFrame =
    scored0.groupBy("query_id")
      .agg(graft.functions.TopK.topKLongPayload(
        col("score"), col("doc_id"), col("n_terms_hit"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.payload").as("n_terms_hit"), col("t.value").as("score"),
        (col("pos") + 1).cast("int").as("rank"))

  def bm25TopK(docs: DataFrame, queryPred: Column, nTerms: Int = 5,
               k: Int = 10, tfOpt: Option[DataFrame] = None,
               scoredOpt: Option[DataFrame] = None): DataFrame =
    bm25TopKFromScores(
      scoredOpt.getOrElse(bm25Scores(docs, queryPred, nTerms, tfOpt)), k)

  /** Passage-level BM25 with MaxP document ranking (Dai & Callan,
    * SIGIR 2019): long documents are scored by their BEST passage, not
    * their bag-of-words whole — the standard fix for length-diluted
    * BM25 on book/web-page corpora. Documents split into fixed
    * `passageWords`-token windows (non-overlapping, positional
    * postings supply the offsets), a passage-granular BM25 index
    * scores each (query, passage), and per (query, doc) the MAX
    * passage score ranks (argmax passage reported, smallest offset on
    * ties — `max(struct(score, −p))`, deterministic both engines).
    *
    * Shape at scale: identical to the doc-level pipeline one
    * granularity down — broadcast query terms probe the passage
    * postings (BHJ), the dl join is the one corpus-cardinality
    * exchange, the MaxP reduction and the final bounded heap are
    * map-side aggregations. Passage ids pack as
    * doc_id·2^20 + passage (docs to 52M tokens, ids to 2^43); the
    * bound is ENFORCED per row — the packed id is computed through a
    * CASE whose overflow branch is `raise_error`, which the optimizer
    * cannot prune (it produces the projected value) — so an
    * out-of-contract corpus fails loudly instead of attributing a
    * passage's score to the next document. */
  def bm25MaxP(docs: DataFrame, queryPred: Column, k: Int = 10,
               nTerms: Int = 5, passageWords: Int = 50,
               tfOpt: Option[DataFrame] = None,
               postingsOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    val qt = queryTerms(tf, queryPred, nTerms)
    val ptf = postingsOpt.getOrElse(positionalPostings(docs))
      .withColumn("p", expr(s"(pos - 1) div $passageWords"))
      // loud guard on the packing contract: p >= 2^20 would silently
      // credit this passage to doc_id + 1. The guard lives IN the
      // projected value (the raise_error branch of the packing CASE) —
      // a side-condition filter of the `assert_true(..) is null OR true`
      // shape is provably dead: BooleanSimplification rewrites `X OR
      // true` to `true` and prunes the filter, so the assert never ran
      .select(
        when(col("p") < lit(1048576L),
          col("doc_id") * lit(1048576L) + col("p"))
          .otherwise(raise_error(lit(
            "bm25MaxP: passage index exceeds the 2^20 packing bound")))
          .as("doc_id"),
        col("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val idx = buildBm25Index(ptf.select("doc_id").distinct(), Some(ptf))
    // persisted: the heap cut below reads `best` twice (heap + join-back)
    // and everything above is the passage-granular index build
    val best = graft.core.SharedFrames.register(
      bm25TermContribsFromTerms(idx, qt)
      .groupBy("query_id", "doc_id").agg(sum(col("c")).as("pscore"))
      .select(col("query_id"), expr("doc_id div 1048576").as("doc"),
        expr("doc_id % 1048576").as("p"), col("pscore"))
      .groupBy(col("query_id"), col("doc").as("doc_id"))
      .agg(max(struct(col("pscore"), (-col("p")).as("np"))).as("b"))
      .select(col("query_id"), col("doc_id"),
        col("b.pscore").as("best_score"), (-col("b.np")).as("best_p")))
    best.groupBy("query_id")
      .agg(graft.functions.TopK.topKLong(col("best_score"), col("doc_id"), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos0", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos0") + 1).cast("int").as("rank"))
      .join(best, Seq("query_id", "doc_id"))
      .select("query_id", "doc_id", "best_p", "best_score", "rank")
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 shape,
    * Abdul-Jaleel et al. 2004, integer-exact): each query's BM25
    * top-`fbDocs` play the feedback set; the `fbTerms` heaviest
    * NON-QUERY terms across that set (weight = total tf, tok asc
    * tiebreak — exact integers, no λ-smoothed float mixture) join the
    * original terms, and a SECOND BM25 pass scores the expanded query.
    * Output: new top-k with each doc's original rank alongside (null =
    * surfaced only by expansion — the recall the technique exists for).
    *
    * Shape at scale: the feedback set is queries·fbDocs rows
    * (broadcast); term mining probes the tf frame with those ids
    * (BHJ — the corpus never shuffles for it) and its rank window
    * partitions by query over a feedback-vocab-bounded frame; the
    * second pass is the same broadcast-probe scoring as the first with
    * queries·(nTerms+fbTerms) terms. Two passes total — the price of
    * expansion in any engine. */
  def prfExpand(docs: DataFrame, queryPred: Column, k: Int = 10,
                nTerms: Int = 5, fbDocs: Int = 5, fbTerms: Int = 3,
                idxOpt: Option[Bm25Index] = None,
                scoredOpt: Option[DataFrame] = None): DataFrame = {
    val idx = idxOpt.getOrElse(buildBm25Index(docs))
    val tf = idx.tf
    val scored = scoredOpt.getOrElse(bm25ScoresFromIndex(idx, queryPred, nTerms))
    val qt = queryTerms(tf, queryPred, nTerms)
    val fb = bm25TopKFromScores(scored, fbDocs).select("query_id", "doc_id")
    val mined = tf.join(broadcast(fb), Seq("doc_id"))
      .groupBy("query_id", "tok").agg(sum(col("tf")).as("wt"))
      .join(qt, Seq("query_id", "tok"), "left_anti")
    val ew = Window.partitionBy("query_id")
      .orderBy(col("wt").desc, col("tok").asc)
    val expTerms = mined.withColumn("rn", row_number().over(ew))
      .filter(col("rn") <= fbTerms).select("query_id", "tok")
    val scored2 = bm25TermContribsFromTerms(idx, qt.union(expTerms))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c")).as("score"))
    val orig = bm25TopKFromScores(scored, k)
      .select(col("query_id"), col("doc_id"), col("rank").as("orig_rank"))
    bm25TopKFromScores(scored2, k)
      .select(col("query_id"), col("doc_id"), col("rank").as("new_rank"),
        col("score").as("exp_score"))
      .join(orig, Seq("query_id", "doc_id"), "left")
      .select("query_id", "doc_id", "new_rank", "exp_score", "orig_rank")
  }

  /** Late-interaction (MaxSim) rerank of a first-stage candidate list —
    * the ColBERT scoring shape (Khattab & Zaharia, SIGIR 2020): every
    * QUERY token keeps its own vector, a candidate's score is
    * Σ_{q tok} max_{doc tok} ⟨v_q, v_d⟩, and the sum rewards documents
    * that cover ALL query aspects where a single pooled vector blurs
    * them. Token vectors here are engine-generated char-3-gram hashed
    * embeddings (the `q_hash_embed` feature-hashing trick one level
    * down: token → its 3-grams → ±1 signed counts in 16 dims), so
    * morphologically close tokens score > 0 and the whole pipeline is
    * exact-integer — no external model, no floats. Non-interacting
    * token pairs contribute 0, so each per-query-token max is clamped
    * at 0 (`greatest(max(dot), 0)`).
    *
    * SCALE SHAPE — rerank, not search: candidates come from the BM25
    * top-k (queries·k rows, broadcast), so the ONLY corpus-cardinality
    * step is the tf probe against the broadcast candidate ids (BHJ, no
    * corpus shuffle); token vectors are built for the BOUNDED involved
    * vocabulary (queries·nTerms + candidate-doc tokens), and every
    * frame after that is ≤ queries·k·|doc vocab|·nTerms rows. The
    * final rerank window sees k rows per query. */
  def maxSimRerank(docs: DataFrame, queryPred: Column, k: Int = 10,
                   nTerms: Int = 5, hashDim: Int = 16,
                   tfOpt: Option[DataFrame] = None,
                   scoredOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    val scored = scoredOpt.getOrElse(
      bm25ScoresFromIndex(buildBm25Index(docs, Some(tf)), queryPred, nTerms))
    // cands is read 3 times below (query-vector join, candidate-token
    // probe, final left join), and each re-evaluation re-runs the TopK
    // heap aggregate + join-back and its AQE stages — persisting the
    // queries·k-row cut collapses those three subtrees to one cache read
    // (dt / vecs stay unpersisted: pipelined scans of cached frames)
    val cands = graft.core.SharedFrames.register(
      bm25TopKFromScores(scored, k)
        .select(col("query_id"), col("doc_id"), col("rank")))
    val qt = queryTerms(tf, queryPred, nTerms)
    val dt = tf
      .join(broadcast(cands.select("doc_id").distinct()), Seq("doc_id"))
      .select(col("doc_id"), col("tok"))
    // char-3-gram hashed token vectors for the involved vocabulary only
    // (substr clamps, so a 1–2 char token contributes itself as its gram).
    // DENSE-ARRAY layout: the (tok, dim, v) sparse rows roll up into one
    // hashDim-long array per token, so the q×d token-pair join below
    // carries ONE row per (qtok, dtok) pair instead of one per matching
    // dim — hashDim× fewer join rows — and the dot product becomes an
    // in-row codegen expression, deleting the widest aggregation of the
    // old plan (the 5-key groupBy that re-shuffled every (q, d, qtok,
    // dtok, dim) row). Exact-integer equality with the sparse form:
    // absent dims are 0 and contribute 0 to the dot; a token pair whose
    // dims never overlap now yields dot = 0 instead of no row, which the
    // existing greatest(max, 0) clamp maps to the same mx.
    val vecs = qt.select(col("tok")).union(dt.select(col("tok"))).distinct()
      .select(col("tok"), explode(transform(
        sequence(lit(1), greatest(length(col("tok")) - 2, lit(1))),
        i => col("tok").substr(i, lit(3)))).as("g"))
      .withColumn("h",
        conv(substring(md5(concat(lit("fh3_"), col("g"))), 1, 8), 16, 10)
          .cast("long"))
      .groupBy(col("tok"), pmod(col("h"), lit(hashDim)).cast("int").as("dim"))
      // sign bit taken ABOVE the dim bits (h div hashDim, not a fixed
      // 16): a fixed divisor would correlate sign with dim for
      // hashDim > 16 and destroy the ±1 Rademacher property
      .agg(sum(lit(1L) - lit(2L) * pmod(expr(s"h div $hashDim"), lit(2)))
        .as("v"))
      // vocab-bounded rollup to a dense map, then a fixed-length array
      .groupBy("tok")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v"))))
        .as("m"))
      .select(col("tok"), transform(sequence(lit(0), lit(hashDim - 1)),
        d => coalesce(element_at(col("m"), d), lit(0L))).as("arr"))
    val qv = qt.join(vecs, Seq("tok"))
      .select(col("query_id"), col("tok").as("qtok"), col("arr").as("qarr"))
    val dv = dt.join(vecs, Seq("tok"))
      .select(col("doc_id"), col("tok").as("dtok"), col("arr").as("darr"))
    // unrolled exact-long dot: element_at with literal indices keeps the
    // whole expression inside whole-stage codegen (no higher-order lambda)
    val dot = (1 to hashDim).map(i =>
      element_at(col("qarr"), i) * element_at(col("darr"), i))
      .reduce(_ + _)
    val maxsim = cands
      .join(qv, Seq("query_id"))
      .join(dv, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("rank"), col("qtok"),
        col("dtok"), dot.as("dot"))
      .groupBy("query_id", "doc_id", "rank", "qtok")
      .agg(greatest(max(col("dot")), lit(0L)).as("mx"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("mx")).as("maxsim"))
    cands.join(maxsim, Seq("query_id", "doc_id"), "left")
      .withColumn("maxsim", coalesce(col("maxsim"), lit(0L)))
      .select(col("query_id"), col("doc_id"), col("rank").as("bm25_rank"),
        col("maxsim"))
      .withColumn("new_rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("maxsim").desc, col("bm25_rank").asc)))
  }

  /** Block-Max WAND pruning report (Ding & Suel 2011) — [[maxScorePrune]]
    * at block granularity, composing the same 128-doc blocks the
    * inverted-index statistics encode: a block b of term t's posting
    * list can be skipped by t's cursor whenever even its best document
    * cannot reach the heap floor while maxing every OTHER query term's
    * GLOBAL bound:
    *
    *   blk_max(t, b) + Σ_{t' ≠ t} ub(t') < θ   (strict, exact BIGINTs)
    *
    * This prunes inside essential terms too — the postings MaxScore
    * still walks — which is why production engines store per-block
    * maxima next to the postings. Per query: total (term, block) pairs,
    * how many are skippable, and the posting rows inside them.
    *
    * And the statistic that bites at every scale: the per-DOCUMENT
    * block-max bound Σ_t blk_max(t, blk(d)) over d's matched terms —
    * an upper bound on d's exact score computable from the block maxima
    * alone, so every candidate whose bound stays strictly below θ is
    * REJECTED WITHOUT EXACT SCORING (no per-posting division, no dl
    * lookup — the arithmetic BMW exists to avoid). On this corpus that
    * rejects ~60% of matched candidates; the term-cursor block skips
    * only appear once posting lists span many blocks (a corpus-scale
    * effect, reported but legitimately 0 at test scale).
    *
    * Shape at scale: one more (query, term, block) max-aggregation over
    * the SAME probe frame (map-side combined), one equi-join of the
    * probe back to its own block maxima on (query, term, block), and
    * ≤ queries·nTerms broadcast frames — nothing corpus-sized beyond
    * the probe itself. RetrievalSpec re-checks every flag in BigInt and
    * pins that no rejected doc reaches the top-k. */
  def blockMaxPrune(contribs0: DataFrame, scored: DataFrame,
                    k: Int = 10, blockSize: Int = 128): DataFrame = {
    val contribs = contribs0
      .withColumn("blk", expr(s"doc_id div ${blockSize}L"))
    val thr = bm25TopKFromScores(scored, k)
      .groupBy("query_id").agg(min(col("score")).as("threshold"))
    val bounds = contribs.groupBy("query_id", "tok")
      .agg(max(col("c")).as("ub"))
    val tot = bounds.groupBy("query_id").agg(sum(col("ub")).as("tot_ub"))
    // blk feeds both reports but is NOT persisted: it is one map-side
    // combined aggregation over the cached contribs frame, and
    // persisting it measured slower than recomputing (see maxSimRerank)
    val blk = contribs.groupBy("query_id", "tok", "blk")
      .agg(max(col("c")).as("blk_max"))
    val cursorSkips = blk
      .join(broadcast(bounds), Seq("query_id", "tok"))
      .join(broadcast(tot), Seq("query_id"))
      .join(broadcast(thr), Seq("query_id"))
      .withColumn("skippable",
        col("blk_max") + (col("tot_ub") - col("ub")) < col("threshold"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("skippable"), 1L).otherwise(0L)).as("n_skippable_blocks"))
    val docRejects = contribs
      .join(blk, Seq("query_id", "tok", "blk"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("blk_max")).as("ub_doc"))
      .join(broadcast(thr), Seq("query_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ub_doc") < col("threshold"), 1L).otherwise(0L))
          .as("n_docs_rejected"),
        min(col("threshold")).as("threshold"))
    cursorSkips.join(docRejects, Seq("query_id"))
      .withColumn("reject_pct",
        expr("(n_docs_rejected * 100) div n_docs"))
  }

  /** Exact phrase match from positional postings — never a substring
    * scan: phrase terms with their offsets broadcast against the
    * postings frame (a broadcast-hash probe, like the BM25 one), each
    * match anchored to its candidate start = pos − offset + 1, and a
    * start survives iff ALL `phraseLen` offsets hit it (positions are
    * unique per doc, so a plain count equals the distinct-offset
    * count). Output: (query_id, doc_id, n_occ). Queries are
    * corpus-derived and deterministic: each doc matching `queryPred`
    * contributes its first `phraseLen` tokens as the phrase.
    *
    * This answers the reference's actual retrieval surface — substring/
    * phrase search (`master_map2.html:682–699`) — at corpus scale:
    * cost is the phrase terms' posting lists, not a full-text scan. */
  def phraseMatch(docs: DataFrame, queryPred: Column, phraseLen: Int = 3,
                  postingsOpt: Option[DataFrame] = None): DataFrame = {
    val postings = postingsOpt.getOrElse(positionalPostings(docs))
    val qp = postings.filter(queryPred && col("pos") <= phraseLen)
      .select(col("doc_id").as("query_id"), col("tok"),
        col("pos").as("off"))
    postings
      .join(broadcast(qp), Seq("tok"))
      .withColumn("start", col("pos") - col("off") + 1)
      .filter(col("start") >= 1)
      .groupBy("query_id", "doc_id", "start")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === phraseLen)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Pairwise min-window proximity ranking from positional postings —
    * the term-proximity signal (Büttcher/Clarke-style) that bag-of-words
    * BM25 cannot express and phrase match only answers for exact
    * adjacency: for every unordered pair of distinct query terms a
    * document contains, the minimum token distance between their
    * occurrences, scored `Σ_pairs 10^6 div min_gap` — closer co-occurring
    * pairs dominate, and the score stays an exact BIGINT (≤ C(nTerms,2)
    * · 10^6, far under 2^53, so the double-keyed heap would also have
    * been safe; the long-keyed one keeps the invariant uniform).
    *
    * The min gap of two sorted position lists is computed IN-ROW by a
    * tagged merge: tag each list, `array_sort` the union, and fold once
    * keeping the last position seen from each side — every adjacent
    * opposite-side pair is a candidate gap, so the fold's minimum is the
    * true minimum in O((n1+n2) log) per pair, never the n1·n2 position
    * cross product (a hot term in a long document makes the quadratic
    * form the scale hazard; positions are unique per doc, so the merged
    * order is total and gaps are strictly positive).
    *
    * Shape at scale: the queries·nTerms term list broadcasts against the
    * postings (broadcast-hash probe, corpus never shuffles for it); only
    * MATCHED postings reach the two aggregations — (query, doc, tok)
    * position-list collect, then (query, doc) pair fold over ≤ nTerms
    * entries — and the top-k cut is the bounded-heap long aggregate
    * (k rows per query per partition cross the exchange). */
  def proximityRank(docs: DataFrame, queryPred: Column, nTerms: Int = 5,
                    k: Int = 10, tfOpt: Option[DataFrame] = None,
                    postingsOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    val qt = queryTerms(tf, queryPred, nTerms)
    val postings = postingsOpt.getOrElse(positionalPostings(docs))
    val perTerm = postings
      .join(broadcast(qt), Seq("tok"))
      .groupBy("query_id", "doc_id", "tok")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    val scored = perTerm
      .groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("tok"), col("ps")))).as("terms"))
      .withColumn("gaps", expr(
        """flatten(transform(terms, (x, i) ->
          |  transform(slice(terms, i + 2, size(terms)), y ->
          |    aggregate(
          |      array_sort(concat(
          |        transform(x.ps, p -> struct(p AS pos, 0 AS side)),
          |        transform(y.ps, p -> struct(p AS pos, 1 AS side)))),
          |      struct(CAST(NULL AS BIGINT) AS la, CAST(NULL AS BIGINT) AS lb,
          |             CAST(NULL AS BIGINT) AS best),
          |      (a, e) -> struct(
          |        IF(e.side = 0, CAST(e.pos AS BIGINT), a.la) AS la,
          |        IF(e.side = 1, CAST(e.pos AS BIGINT), a.lb) AS lb,
          |        least(a.best,
          |          IF(e.side = 0, CAST(e.pos AS BIGINT) - a.lb,
          |                         CAST(e.pos AS BIGINT) - a.la)) AS best),
          |      a -> a.best))))""".stripMargin))
      .filter(size(col("gaps")) >= 1)
      .select(col("query_id"), col("doc_id"),
        size(col("gaps")).cast("long").as("n_pairs_hit"),
        expr("aggregate(gaps, 0L, (s, g) -> s + 1000000L div g)")
          .as("prox_score"))
    // persisted: the cut reads `scored` twice (heap + join-back), and
    // upstream is the probe + both positional aggregations
    val scoredP = graft.core.SharedFrames.register(scored)
    val top = scoredP.groupBy("query_id")
      .agg(graft.functions.TopK.topKLong(
        col("prox_score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"))
    top.join(scoredP, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("n_pairs_hit"),
        col("prox_score"), col("rank"))
  }

  /** LEB128/varint byte cost of a positive gap: ceil(bits/7). */
  private def varintBytes(gapCol: String): Column =
    expr(s"(length(bin($gapCol)) + 6) div 7")

  /** Per-(term, 128-doc-block) postings summaries — the physical unit of
    * the block-delta index layout (the Lucene/PForDelta shape: block-
    * local deltas mean a reader can skip whole blocks and decode each
    * independently) and the unit [[mergeIndexBlocks]] maintains:
    * df/cf/encoded-bytes per block plus the first/last doc id the merge
    * arithmetic needs. The gap window partitions by (term, block) —
    * bounded at `blockSize` rows regardless of how hot the term is, so
    * a stop-word's billion-row posting list never serializes through
    * one reducer the way a plain per-term window would. */
  def indexBlocks(tf: DataFrame, blockSize: Int = 128): DataFrame = {
    val blk = tf.withColumn("blk", expr(s"doc_id div $blockSize"))
    val gapW = Window.partitionBy("tok", "blk").orderBy("doc_id")
    blk.withColumn("gap",
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(gapW),
          col("doc_id") - col("blk") * blockSize + 1))
      .groupBy("tok", "blk")
      .agg(count(lit(1)).as("df_blk"), sum(col("tf")).as("cf_blk"),
        sum(varintBytes("gap")).as("bytes_blk"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Incremental block maintenance: fold a new batch's postings into an
    * existing block index without re-walking the indexed postings.
    * APPEND-ONLY CONTRACT (the Lucene segment model): new documents get
    * doc ids STRICTLY GREATER than every indexed id, so within a shared
    * boundary block the delta postings land after the base ones and the
    * only correction is the first delta gap — provisionally encoded
    * relative to the block base, re-priced relative to the base block's
    * last doc id. Base-only and delta-only blocks pass through. One
    * full-outer join on (term, block); law-equal to [[indexBlocks]]
    * over the union (RetrievalSpec). */
  def mergeIndexBlocks(base: DataFrame, deltaTf: DataFrame,
                       blockSize: Int = 128): DataFrame = {
    val d = indexBlocks(deltaTf, blockSize)
    val b = base.select(col("tok"), col("blk"), col("df_blk").as("b_df"),
      col("cf_blk").as("b_cf"), col("bytes_blk").as("b_bytes"),
      col("first_doc").as("b_first"), col("last_doc").as("b_last"))
    val dd = d.select(col("tok"), col("blk"), col("df_blk").as("d_df"),
      col("cf_blk").as("d_cf"), col("bytes_blk").as("d_bytes"),
      col("first_doc").as("d_first"), col("last_doc").as("d_last"))
    b.join(dd, Seq("tok", "blk"), "full_outer")
      .withColumn("bridge_gap", col("d_first") - col("b_last"))
      .withColumn("provisional_gap",
        col("d_first") - col("blk") * blockSize + 1)
      .select(col("tok"), col("blk"),
        (coalesce(col("b_df"), lit(0L)) + coalesce(col("d_df"), lit(0L)))
          .as("df_blk"),
        (coalesce(col("b_cf"), lit(0L)) + coalesce(col("d_cf"), lit(0L)))
          .as("cf_blk"),
        (coalesce(col("b_bytes"), lit(0L)) + coalesce(col("d_bytes"), lit(0L)) +
          when(col("b_last").isNotNull && col("d_first").isNotNull,
            varintBytes("bridge_gap") - varintBytes("provisional_gap"))
            .otherwise(lit(0L))).as("bytes_blk"),
        coalesce(col("b_first"), col("d_first")).as("first_doc"),
        coalesce(col("d_last"), col("b_last")).as("last_doc"))
  }

  /** Per-term rollup of a block index: document frequency, collection
    * frequency, block count, and total encoded bytes — the index-size
    * estimate a shard planner reads. Top-`topN` terms by df via
    * TakeOrderedAndProject (per-partition bounded heap), not a global
    * sort. */
  def statsFromBlocks(blocks: DataFrame, topN: Int = 50): DataFrame =
    blocks.groupBy("tok")
      .agg(sum(col("df_blk")).as("df"),
        sum(col("cf_blk")).as("cf"),
        count(lit(1)).as("n_blocks"),
        sum(col("bytes_blk")).as("encoded_bytes"))
      .orderBy(col("df").desc, col("tok").asc)
      .limit(topN)

  /** Block-delta inverted-index statistics over a full corpus: see
    * [[indexBlocks]] / [[statsFromBlocks]] for the layout and the
    * per-posting LEB128 gap cost. */
  def invertedIndexStats(docs: DataFrame, blockSize: Int = 128,
                         topN: Int = 50, tfOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    statsFromBlocks(indexBlocks(tf, blockSize), topN)
  }
}
