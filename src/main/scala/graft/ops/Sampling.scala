package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / ordering / packing primitives for training-data
  * pipelines: a deterministic pseudo-random rank that scales past the
  * single-reducer window, target-mixture stratified sampling built on it,
  * and the sequence-packing chunk planner that assigns document token
  * spans to fixed-budget training sequences.
  *
  * All randomness is md5-derived (the repo's only portable hash — see
  * QueryGroup parity rules), so every operation is a pure function of the
  * data: reruns, cluster layouts, and incremental growth cannot change an
  * assignment.
  */
object Sampling {

  /** Buckets for the two-level rank. At 100 TB this is the parallelism of
    * the per-stratum sort; 1 bucket degenerates to the naive global
    * window. */
  val RankBuckets = 16

  private def rankHash(idCol: Column): Column =
    md5(concat(lit("rank_"), idCol.cast("string")))

  private def rankBucket(idCol: Column, buckets: Int): Column =
    pmod(conv(substring(rankHash(idCol), 1, 4), 16, 10).cast("int"), lit(buckets))

  /** Deterministic pseudo-random rank per stratum, computed WITHOUT a
    * per-stratum global sort. The canonical order within a stratum is
    * (hash-bucket, md5 hash, id) — itself a uniform shuffle order since
    * the leading key is hash-derived. Computation is two-level:
    *
    *   1. row_number within (stratum, bucket) — `buckets`× the
    *      parallelism of a plain per-stratum window, because a
    *      `Window.partitionBy(stratum)` puts each stratum on ONE reducer
    *      (the classic scale cliff for global ordering);
    *   2. + the total count of all earlier buckets in the stratum — a
    *      tiny (strata × buckets)-row aggregate, cumsum'd on the small
    *      frame and broadcast back. (The cumsum window on THAT frame is
    *      the one deliberately partition-less window in the repo: it
    *      sees ≤ strata × buckets rows by construction, never data.)
    *
    * The result is bit-identical to
    * `row_number() OVER (PARTITION BY strata ORDER BY bucket, hash, id)`
    * (law-tested in SamplingSpec), which is exactly what the DuckDB
    * oracle computes.
    *
    * Reference analog: the reference samples/shuffles with
    * `df.sample(frac=...)`-style calls whose output changes run to run;
    * here the shuffle order is a stable corpus property.
    */
  def rankedBy(df: DataFrame, strata: Seq[String], idCol: String,
               buckets: Int = RankBuckets): DataFrame = {
    val withBucket = df
      .withColumn("rank_h", rankHash(col(idCol)))
      .withColumn("rank_bucket", rankBucket(col(idCol), buckets))
    val localW = Window
      .partitionBy((strata :+ "rank_bucket").map(col): _*)
      .orderBy(col("rank_h"), col(idCol))
    val offsetW = Window
      .partitionBy(strata.map(col): _*)
      .orderBy(col("rank_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBucket
      .groupBy((strata :+ "rank_bucket").map(col): _*)
      .agg(count(lit(1)).as("rank_bucket_n"))
      .withColumn("rank_offset",
        coalesce(sum(col("rank_bucket_n")).over(offsetW), lit(0L)))
      .drop("rank_bucket_n")
    withBucket
      .withColumn("rank_local", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), strata :+ "rank_bucket")
      .withColumn("samp_rank", col("rank_offset") + col("rank_local"))
      .drop("rank_h", "rank_local", "rank_offset")
  }

  /** Balanced stratified downsample: every stratum is cut to the size of
    * the SMALLEST stratum (the uniform target mixture), keeping the docs
    * whose pseudo-random rank sorts first. Exact per-stratum counts (a
    * hash-threshold Bernoulli sample only hits the target in
    * expectation), deterministic under reruns. One narrow pass + the
    * two-level rank; the cap is a broadcast 1-row aggregate. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], idCol: String,
                       buckets: Int = RankBuckets): DataFrame = {
    val cap = df.groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("cap"))
    rankedBy(df, strata, idCol, buckets)
      .crossJoin(broadcast(cap))
      .withColumn("keep", col("samp_rank") <= col("cap"))
      .drop("cap")
  }

  /** Sequence-packing plan: assign each document's token span to
    * fixed-`budget` training sequences, GPT-style (documents are
    * concatenated in deterministic order within a shard and the stream is
    * chunked every `budget` tokens, so a doc may straddle sequences).
    * Emits one row per (doc, sequence) with the doc-relative half-open
    * token span [tok_from, tok_to) that lands in that sequence.
    *
    * Shape at scale: shard = md5 bucket (a real pipeline sizes shards to
    * executor count); within a shard one running-sum window ordered by
    * doc_id; the explode fans out only docs that straddle a boundary
    * (≤ 1 + n_tokens/budget rows per doc). No global sort, no driver
    * state — every sequence boundary is a pure function of the shard's
    * cumulative token counts.
    *
    * Input needs `doc_id` and `n_tokens` (> 0 rows are planned; empty
    * docs carry no tokens to pack). */
  def packPlan(docs: DataFrame, budget: Int, nShards: Int): DataFrame = {
    val shard = pmod(
      conv(substring(md5(concat(lit("pack_"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("int"),
      lit(nShards))
    val cumW = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .filter(col("n_tokens") > 0)
      .withColumn("shard", shard)
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens").cast("long")).over(cumW), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("n_tokens"))
      .withColumn("seq_id",
        explode(sequence(expr(s"tok_start div $budget"),
          expr(s"(tok_end - 1) div $budget"))))
      .select(
        col("shard"),
        col("seq_id").cast("long").as("seq_id"),
        col("doc_id"),
        (greatest(col("tok_start"), col("seq_id") * budget) - col("tok_start"))
          .cast("long").as("tok_from"),
        (least(col("tok_end"), (col("seq_id") + 1) * budget) - col("tok_start"))
          .cast("long").as("tok_to"))
  }
}
