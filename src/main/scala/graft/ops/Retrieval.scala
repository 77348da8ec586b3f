package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus: BM25 scoring with exact
  * integer arithmetic and block-delta inverted-index statistics — the
  * query-side companion to the curation operators (a training-data
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

  /** BM25 top-k retrieval, EXACT: the log-free rational-idf BM25 variant
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
    * Queries are corpus-derived and deterministic: each doc matching
    * `queryPred` contributes its `nTerms` highest-tf tokens (tf desc, tok
    * asc) as a query. Shape at scale: the query-term list is
    * queries·nTerms rows → BROADCAST against the tf frame (the postings
    * probe is a broadcast-hash join, the corpus side never shuffles);
    * per-(query, doc) scores aggregate map-side; the final top-k is the
    * bounded-heap [[graft.functions.TopK]] aggregate, so only k rows per
    * query survive to the driver-side ordering — no per-query sort of
    * the whole match set. */
  def bm25Scores(docs: DataFrame, queryPred: Column, nTerms: Int = 5,
                 tfOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(
      graft.core.SharedFrames.register(termFrequencies(docs)))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(coalesce(sum(col("dl")), lit(0L)).as("t_total")))
    val qw = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("tok").asc)
    val qt = tf.filter(queryPred)
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= nTerms)
      .select(col("doc_id").as("query_id"), col("tok"))
    tf
      .join(broadcast(qt), Seq("tok"))
      .join(broadcast(df_), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("c", expr(
        """(CAST(2 * (n - df) + 1 AS DECIMAL(38,0)) * 22 * tf * t_total * 1000000)
          |div (CAST(2 * df + 1 AS DECIMAL(38,0)) *
          |     (10 * tf * t_total + 3 * t_total + 9 * dl * n))""".stripMargin))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c")).as("score"))
  }

  def bm25TopK(docs: DataFrame, queryPred: Column, nTerms: Int = 5,
               k: Int = 10, tfOpt: Option[DataFrame] = None,
               scoredOpt: Option[DataFrame] = None): DataFrame = {
    val scored = scoredOpt.getOrElse(bm25Scores(docs, queryPred, nTerms, tfOpt))
    val top = scored.groupBy("query_id")
      .agg(graft.functions.TopK.topK(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"))
    top.join(scored, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("n_terms_hit"),
        col("score"), col("rank"))
  }

  /** Block-delta inverted-index statistics: postings grouped into
    * 128-doc-id blocks (the Lucene/PForDelta layout — block-local deltas
    * mean a reader can skip whole blocks and decode each independently),
    * per-posting cost = the LEB128/varint bytes of its gap
    * (first-in-block gap is relative to the block base, so it stays
    * ≤ blockSize), rolled up per term: document frequency, collection
    * frequency, block count, and total encoded bytes — the index-size
    * estimate a shard planner reads. Top-`topN` terms by df.
    *
    * Scale shape: the gap window partitions by (term, block) — bounded
    * at `blockSize` rows regardless of how hot the term is, so a
    * stop-word's billion-row posting list never serializes through one
    * reducer the way a plain per-term window would. The final top-N is
    * a TakeOrderedAndProject (per-partition bounded heap), not a global
    * sort. */
  def invertedIndexStats(docs: DataFrame, blockSize: Int = 128,
                         topN: Int = 50, tfOpt: Option[DataFrame] = None): DataFrame = {
    val tf = tfOpt.getOrElse(termFrequencies(docs))
    val blk = tf.withColumn("blk", expr(s"doc_id div $blockSize"))
    val gapW = Window.partitionBy("tok", "blk").orderBy("doc_id")
    val gaps = blk.withColumn("gap",
      coalesce(col("doc_id") - lag(col("doc_id"), 1).over(gapW),
        col("doc_id") - col("blk") * blockSize + 1))
    gaps.groupBy("tok")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        countDistinct(col("blk")).as("n_blocks"),
        sum(expr("(length(bin(gap)) + 6) div 7")).as("encoded_bytes"))
      .orderBy(col("df").desc, col("tok").asc)
      .limit(topN)
  }
}
