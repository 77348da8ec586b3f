package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Retrieval

/** Streaming maintenance of the BM25 / inverted-index artifacts — the
  * stream-side form of [[graft.ops.Retrieval.mergeBm25Index]]: documents
  * arrive as micro-batches and each batch folds into a persisted index
  * store WITHOUT rescanning anything already indexed, closing the
  * retrieval family's incremental loop end to end (batch incremental in
  * `ops.Retrieval`, streaming here — the same pairing as
  * `q_dedup_incremental` / [[NearDupStream]]).
  *
  * The store is APPEND-ONLY on every surface (the Lucene segment model):
  *  - `tf/`    postings (doc_id, tok, tf) — appends (new doc ids are
  *             disjoint from indexed ones: the append-only contract
  *             documented on `Retrieval.mergeIndexBlocks`)
  *  - `dl/`    per-doc lengths — appends for the same reason
  *  - `df/`    per-term document-frequency DELTAS (tok, df) — additive,
  *             so a batch appends its own term counts and READERS merge
  *             by sum; no read-modify-write of a frame the batch is
  *             about to overwrite, hence no in-place-overwrite hazard
  *             and no store scan in the hot path at all
  *  - `stats/` 1-row (n, t_total) deltas — additive likewise
  *
  * A batch therefore costs exactly one tokenize + three map-side-combined
  * aggregations over ITS OWN documents — O(batch), never O(index). The
  * df/stats delta files accumulate one segment per batch; folding them is
  * the small-file compaction problem `q_compact_plan` already plans for
  * (readers stay correct either way — sum-merge is associative).
  *
  * Checkpointing makes the batch sequence exactly-once at the sink level;
  * every per-batch artifact is a deterministic function of the batch, so
  * a replayed batch re-derives byte-identical deltas. */
object IndexStream {

  /** Run to completion (AvailableNow) over a streaming `docs(doc_id,
    * text)` frame, folding each micro-batch into the index store. */
  def runIndexMaintenance(spark: SparkSession, docs: DataFrame,
                          storeDir: String, checkpoint: String): Unit = {
    val q = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tf = Retrieval.termFrequencies(batch).persist()
        try {
          tf.write.mode("append").parquet(s"$storeDir/tf")
          tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
            .write.mode("append").parquet(s"$storeDir/dl")
          tf.groupBy("tok").agg(count(lit(1)).as("df"))
            .write.mode("append").parquet(s"$storeDir/df")
          batch.agg(count(lit(1)).as("n"))
            .crossJoin(tf.agg(coalesce(sum(col("tf")), lit(0L)).as("t_total")))
            .write.mode("append").parquet(s"$storeDir/stats")
          ()
        } finally { tf.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read the store back as a queryable [[Retrieval.Bm25Index]]: tf/dl
    * are the appended segments verbatim; df/stats sum-merge their
    * per-batch deltas (one vocab-bounded aggregation + one 1-row
    * aggregation). Law-equal to `buildBm25Index` over every document
    * ever streamed (StreamingSpec). */
  def loadIndex(spark: SparkSession, storeDir: String): Retrieval.Bm25Index =
    Retrieval.Bm25Index(
      spark.read.parquet(s"$storeDir/tf"),
      spark.read.parquet(s"$storeDir/dl"),
      spark.read.parquet(s"$storeDir/df")
        .groupBy("tok").agg(sum(col("df")).as("df")),
      spark.read.parquet(s"$storeDir/stats")
        .agg(sum(col("n")).as("n"), sum(col("t_total")).as("t_total")))
}
