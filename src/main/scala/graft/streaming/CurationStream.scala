package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Curation gate AT INGEST — the streaming face of the batch blocklist
  * screen (`q_blocklist_hits`): every micro-batch of documents is matched
  * against the phrase blocklist with the Aho–Corasick expression
  * ([[graft.functions.MultiMatch]] — one automaton pass per doc, cost
  * independent of blocklist size) plus a minimum-length gate, survivors
  * append to the kept store and every batch appends an AUDIT row
  * (in/blocked/short/kept counts) — the ingestion ledger a production
  * crawl pipeline keeps.
  *
  * The pattern list is a FIXED side input: production blocklists version
  * independently of the stream (a new list = a new stream version), so
  * the automaton rides the closure into every executor once — no state
  * store at all (contrast [[NearDupStream]], where fingerprints must
  * outlive the batch and live in a persisted index). The gate is a pure
  * projection per batch: stateless and deterministic, so a batch
  * replayed after a crash re-derives byte-identical rows — and both
  * sinks are REPLAY-IDEMPOTENT: each batch overwrites its own
  * `batch=<id>` partition directory (the [[AsOfEnrich]] pattern —
  * exactly-once by overwrite-keyed-by-batch-id), so a crash replay of an
  * uncommitted batch is a no-op and re-running the stream never
  * duplicates a kept row or an audit line. Readers read the root path;
  * partition discovery surfaces `batch` as a column of the ledger. On a
  * real lakehouse table the same key drives an idempotent MERGE.
  * StreamingSpec pins the law: run, replay the last batch, byte-identical
  * store.
  */
object CurationStream {

  /** Run the gate to completion (AvailableNow) over a streaming
    * `docs(doc_id, text)` frame. Kept (doc_id, text, n_hits, n_words)
    * rows append to `keptPath`; per-batch (batch_id, n_in, n_blocked,
    * n_short, n_kept) counts append to `auditPath`. */
  def runBlocklistGate(spark: SparkSession, docs: DataFrame,
                       patterns: Seq[String], keptPath: String,
                       auditPath: String, checkpoint: String,
                       minWords: Int = 3): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, patterns, keptPath, auditPath, minWords)
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of the gate — package-visible so the replay-
    * idempotence law (StreamingSpec) can re-run a committed batch the way
    * a crash recovery would and assert the store is byte-identical. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  patterns: Seq[String], keptPath: String,
                                  auditPath: String, minWords: Int): Unit = {
    // null text is coalesced to '' BEFORE the gates so the three
    // audit buckets PARTITION the batch (a null n_hits would make
    // blocked/short null and the doc would vanish from the ledger —
    // the exact hole an ingestion ledger exists to close); the word
    // count filters empty split parts so whitespace-only text is 0
    // words, not 1
    val flagged = batch
      .withColumn("text", coalesce(col("text"), lit("")))
      .withColumn("cnts",
        graft.functions.MultiMatch.multiMatchCounts(col("text"), patterns))
      .withColumn("n_hits",
        expr("aggregate(cnts, 0L, (a, x) -> a + x)"))
      .withColumn("n_words",
        size(filter(split(trim(col("text")), "\\s+"),
          w => length(w) > 0)).cast("long"))
      .withColumn("blocked", col("n_hits") > 0)
      .withColumn("short", !col("blocked") && col("n_words") < minWords)
      // two actions read this frame (audit agg + survivor write):
      // persist so the source scan + automaton pass run once
      .persist()
    // overwrite-by-batch-id (NOT append): replaying an uncommitted
    // batch rewrites the same partition directory with the same
    // deterministic rows — the crash-replay no-op AsOfEnrich uses
    flagged.agg(
        count(lit(1)).as("n_in"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
        sum(when(col("short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(!col("blocked") && !col("short"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "n_in", "n_blocked", "n_short", "n_kept")
      .write.mode("overwrite").parquet(s"$auditPath/batch=$batchId")
    flagged.filter(!col("blocked") && !col("short"))
      .select("doc_id", "text", "n_hits", "n_words")
      .write.mode("overwrite").parquet(s"$keptPath/batch=$batchId")
    flagged.unpersist()
    ()
  }
}
