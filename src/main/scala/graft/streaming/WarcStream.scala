package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Warc

/** Streaming WARC ingestion — crawl archives arrive as a stream, each
  * micro-batch walks its records ([[Warc.parseArchives]] — gzip-member
  * transparent, Content-Length framed) and appends only content-NEW
  * documents to the persisted store: the store wins against re-crawled
  * payloads (same md5, any URI), and within a batch the smallest URI
  * wins via a min-struct AGGREGATION (the first-occurrence discipline —
  * never a per-key window). This is [[NearDupStream]]'s ingest shape at
  * the exact-duplicate tier: crawlers re-fetch unchanged pages
  * constantly, so content-keyed suppression at ingest is what keeps a
  * crawl store from growing with fetch count instead of content count.
  *
  * Checkpointing makes the batch sequence exactly-once at the sink
  * level; the suppression rule is deterministic, so replaying a batch
  * re-derives the same survivors. At 100 TB the parquet store becomes a
  * transactional table and the append a MERGE — per-batch join shape
  * unchanged. */
object WarcStream {

  /** Run to completion (AvailableNow) over a streaming
    * `archives(group_id, payload)` frame; `storePath` accumulates one
    * row per distinct content payload. */
  def runArchiveIngest(spark: SparkSession, archives: DataFrame,
                       storePath: String, checkpoint: String): Unit = {
    val q = archives.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val docs = Warc.parseArchives(s,
            batch.as[(Long, Array[Byte])])
          .filter(col("warc_type") === "response")
          .select("payload_md5", "group_id", "target_uri",
            "content_lang", "content_length")
          .persist()
        try {
          val store =
            if (new java.io.File(storePath).exists()) s.read.parquet(storePath)
            else s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row], docs.schema)
          val fresh = docs.join(store.select("payload_md5"),
            Seq("payload_md5"), "left_anti")
          // first occurrence within the batch: min-struct aggregation
          // (map-side combined), never row_number over the content key
          val kept = fresh.groupBy("payload_md5")
            .agg(min(struct(col("target_uri"), col("group_id"),
              col("content_lang"), col("content_length"))).as("r"))
            .select(col("payload_md5"), col("r.group_id"),
              col("r.target_uri"), col("r.content_lang"),
              col("r.content_length"))
            .persist()
          kept.count() // pin before the append changes what store re-reads
          kept.write.mode("append").parquet(storePath)
          kept.unpersist()
          ()
        } finally { docs.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
