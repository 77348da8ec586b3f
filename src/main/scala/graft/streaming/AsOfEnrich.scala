package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Point-in-time-correct streaming enrichment — the feature-store as-of
  * join, streamed: every micro-batch of click events is enriched with the
  * LATEST view at-or-before each click's event time from a static
  * versioned feature table, through the native as-of operator
  * ([[graft.plans.AsOfJoinExec]]) per batch.
  *
  * Why this shape matters for training data: "latest at-or-before" is
  * exactly the rule that prevents TEMPORAL LEAKAGE when assembling
  * training examples — a feature value computed after the label event
  * must never join onto it. A plain stream-static equi-join (the
  * `enrichBySegment` shape) matches the CURRENT feature row and silently
  * leaks the future; the as-of join pins each event to the feature
  * version that existed when the event happened.
  *
  * Why foreachBatch is the right host: inside the batch the plan has
  * full operator freedom (custom physical nodes included — stream-side
  * plans cannot host arbitrary exec nodes), the feature table is static
  * per batch, and the checkpoint makes the enrichment resumable: each
  * batch appends once, replays of an uncommitted batch overwrite by
  * batch id (idempotent via per-batch output partition).
  *
  * Scale: the per-batch join co-partitions batch + features on the key
  * exactly like the batch operator; a pre-bucketed feature table makes
  * every micro-batch exchange-free on the feature side. */
object AsOfEnrich {

  /** Run the enrichment over `clicks` (a STREAMING frame with columns
    * (user_id, click_ts_us, click_id)) against the static `views`
    * frame (v_user, view_ts_us, view_id); appends enriched batches under
    * `outPath/batch=<id>` (idempotent per batch id on replay). */
  def run(spark: SparkSession, clicks: DataFrame, views: DataFrame,
          outPath: String, checkpoint: String): Unit = {
    val q = clicks.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.plans.AsOfJoin.join(batch, views,
            "user_id", "v_user", "click_ts_us", "view_ts_us")
          .write.mode("overwrite") // replay-idempotent: same batch, same dir
          .parquet(s"$outPath/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
