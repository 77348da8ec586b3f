package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming slice (SURVEY.md §2.10): the reference's incremental
  * semantics — append-only sink with checkpoint/resume by key
  * (`chat_acreage_bot.py:793-837`) and idempotent only-update-if-better
  * merge (`master_acreage_merge.py:121-142`) — mapped onto Structured
  * Streaming:
  *
  *  - file source over the events parquet (schema locked up front, ns
  *    timestamps read as longs then truncated to us);
  *  - watermark + tumbling-window aggregation;
  *  - `foreachBatch` upsert for the merge semantics (checkpointing makes
  *    re-runs exactly-once at the batch level, replacing the reference's
  *    resume-from-names-already-present scan).
  */
object EventStream {

  /** Streaming events source (ts already truncated to microseconds). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source requires a directory: stream the sf dir with
    // a glob filter selecting only the events file
    graft.core.Tables.normalizeTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Tumbling 1-hour windowed counts/sums with a 1-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding 2-hour windows advancing every hour, 1-hour watermark: each
    * event lands in exactly two overlapping windows (window = 2 x slide).
    * Sliding windows are the smoothed-rate monitoring shape — tumbling
    * counts jump at boundaries, session windows need gaps; the overlap
    * here trades 2x state rows for boundary-free trends. State stays
    * bounded: a window's state is evicted once the watermark passes its
    * end, exactly as for tumbling. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup: keep the first arrival of each key, dropping
    * any duplicate that arrives within the watermark delay of it. State
    * per key is bounded — it expires once the event-time watermark passes
    * key_ts + delay, which is what makes this safe on an unbounded
    * training-data ingest stream (the batch-side exact dedup over the
    * full corpus is `q_dedup_exact`; this is its streaming complement for
    * at-ingest duplicate suppression). */
  def dedupWithinWatermark(events: DataFrame, delay: String,
                           keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream interval join: for every view, the clicks
    * by the same user within `[view_ts, view_ts + joinWindow]`. Both
    * sides carry event-time watermarks and the join condition bounds
    * click_ts relative to view_ts, so the state store can EVICT: a
    * buffered view expires once the click-side watermark passes
    * view_ts + joinWindow, a buffered click once the view-side watermark
    * passes click_ts — bounded state on an unbounded stream, which is
    * what makes a stream-stream join survive at ingest scale (an
    * unconstrained join would buffer both streams forever). Output
    * matches the batch twin `q_stream_join` exactly (asserted in
    * StreamingSpec); timestamps are emitted as epoch-microsecond BIGINTs
    * per the cross-engine convention. */
  def intervalJoin(events: DataFrame, joinWindow: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    intervalJoinImpl(events, joinWindow, watermark, "inner")

  /** LEFT-OUTER watermarked stream-stream join: every view eventually
    * emits — matched rows as they join, UNMATCHED views with null click
    * columns once the watermark passes their join window (the state store
    * can then prove no matching click can still arrive; this is why outer
    * stream-stream joins REQUIRE both watermarks and a time-range
    * condition). The funnel-drop-off shape: views that never converted,
    * produced incrementally at ingest. Batch twin `q_stream_join_outer`;
    * StreamingSpec asserts equality on the emit-eligible prefix (rows
    * whose expiry the final watermark has reached) and null-row emission
    * on watermark advance. */
  def intervalJoinOuter(events: DataFrame, joinWindow: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    intervalJoinImpl(events, joinWindow, watermark, "left_outer")

  /** CHAINED stateful operators (Spark 3.4+): the watermarked
    * stream-stream interval join feeds a tumbling event-time aggregation
    * in the SAME streaming query — joined (view, click) pairs counted per
    * view hour. Two state stores back to back (join buffer, window
    * state), both bounded by the shared watermark; the per-hour counts
    * finalize when the watermark passes the window end. Batch twin
    * `q_join_tumbling` (asserted equal in StreamingSpec). */
  def joinThenTumbling(events: DataFrame, joinWindow: String = "30 minutes",
                       watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"))
      .groupBy(window(col("view_ts"), "1 hour"))
      // count(*) only: DISTINCT aggregates are unsupported on streaming
      // frames (the state store would need per-key sets, not counters)
      .agg(count(lit(1)).as("n_pairs"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_pairs"))
  }

  private def intervalJoinImpl(events: DataFrame, joinWindow: String,
                               watermark: String, joinType: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $joinWindow"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_ts")).as("view_ts_us"),
        unix_micros(col("click_ts")).as("click_ts_us"))
  }

  /** Stream-static enrichment join: every micro-batch of the event stream
    * joins the bounded customer dimension, then aggregates revenue by
    * market segment. The static side is marked broadcast, so each
    * micro-batch plans a BroadcastHashJoin against an executor-resident
    * dim copy — no shuffle of the stream side and no join state store at
    * all (unlike stream-stream, the static side is complete, so there is
    * nothing to buffer or evict). This is the at-ingest version of the
    * batch star join: at 100 TB/day the stream side stays partitioned by
    * arrival and only the dim (MBs) moves. Batch twin: `q_stream_enrich`
    * (asserted equal in StreamingSpec). */
  def enrichBySegment(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Streaming frequent items: a per-event-type Misra–Gries summary
    * ([[graft.functions.MisraGriesAgg]]) over the props key value. The
    * whole point on an unbounded stream is the STATE bound: the state
    * store holds at most `capacity` counters per group forever, where an
    * exact per-item streaming count's state grows with the item space
    * (the top-URLs / top-user-agents dashboard over an unbounded ingest).
    * Complete-mode output; exact whenever the item NDV stays within
    * `capacity` — the regime the batch twin `q_stream_hitters` pins
    * (StreamingSpec asserts stream == batch on the same events file). */
  def hittersByType(events: DataFrame, capacity: Int = 128): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").as("item"))
      .groupBy("event_type")
      .agg(graft.functions.HeavyHitters.heavyHitters(col("item"), capacity)
        .as("hh"))

  /** Run a streaming aggregation to a memory sink, synchronously, and
    * return the materialized result. */
  def runToMemory(spark: SparkSession, agg: DataFrame, name: String,
                  checkpoint: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** foreachBatch upsert: merge each micro-batch's per-user value maxima
    * into an accumulating store, only updating when the new value is
    * larger (the reference's only-update-if-better merge). The store is a
    * parquet directory rewritten per batch — at scale this becomes a
    * Delta/Iceberg MERGE, but the join+coalesce shape is identical.
    *
    * Exactly-once EFFECT under crash/restart comes from the merge being
    * idempotent, not from the store write being atomic with the
    * checkpoint: if the process dies after the store swap but before the
    * batch commits, the restarted query replays the batch and the
    * only-update-if-better merge re-applies it harmlessly.
    * `afterBatch` runs at exactly that vulnerable point (store swapped,
    * batch not yet committed) so tests can inject the crash. */
  def runUpsert(spark: SparkSession, events: DataFrame, storePath: String,
                checkpoint: String, afterBatch: Long => Unit = _ => ()): Unit = {
    val q = events
      .groupBy(col("user_id"))
      .agg(max(col("value")).as("value"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val merged =
          if (new java.io.File(storePath).exists()) {
            val master = spark.read.parquet(storePath)
              .withColumnRenamed("value", "old_value")
            master.join(batch.withColumnRenamed("value", "new_value"),
                Seq("user_id"), "full_outer")
              .select(col("user_id"),
                when(col("new_value").isNotNull &&
                    (col("old_value").isNull || col("new_value") > col("old_value")),
                  col("new_value")).otherwise(col("old_value")).as("value"))
          } else batch
        merged.write.mode("overwrite").parquet(storePath + ".tmp")
        val fs = new java.io.File(storePath)
        if (fs.exists()) { scala.reflect.io.Directory(fs).deleteRecursively() }
        new java.io.File(storePath + ".tmp").renameTo(fs)
        afterBatch(batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
