package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{SharedFrames, Tables}

/** Event-stream shaped queries (SURVEY.md §2.10): the batch equivalents of
  * the streaming slice — tumbling-window aggregation and semi-structured
  * props extraction. The true Structured Streaming versions (file source +
  * watermark + checkpoint) live in [[graft.streaming.EventStream]] and are
  * asserted equal to these batch results in StreamingSpec.
  */
object EventsQueries extends QueryGroup {

  /** Tumbling 1-hour window counts + value sums per event type.
    * Window starts are emitted as epoch-microsecond BIGINTs: timestamp
    * columns in outputs invite tz-adjustment/ns-precision comparison
    * hazards between engines, while epoch integers are exact. */
  private def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("window_start_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("window_start_us", "event_type")

  /** Sliding-window batch twin (2-hour windows, 1-hour slide): each event
    * belongs to exactly window/slide = 2 overlapping windows, so the
    * oracle is the union of two shifted tumbling assignments. Spark's
    * `window(ts, len, slide)` generates the per-event window fan-out
    * natively (a bounded explode, factor len/slide) and the aggregation
    * stays one hash-shuffle on (window, type) — there is no per-window
    * rescan of the input. The streaming version (watermarked, bounded
    * state) is [[graft.streaming.EventStream.slidingCounts]], asserted
    * equal in StreamingSpec. */
  private def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start_us", "event_type")

  /** Props parsed ONCE per (session, dir), carrying all three
    * semi-structured representations side by side: `k_str` (path
    * extraction, get_json_object), `parsed` (closed-schema from_json
    * struct) and `k_var` (open-schema VARIANT via try_parse_json +
    * variant_get). One pass over the JSON feeds every props consumer —
    * at corpus scale re-parsing the payload per query is the dominant
    * cost, exactly like re-shingling is for the dedup family.
    * try_parse_json (not parse_json) so malformed rows degrade to NULL,
    * matching DuckDB's json_extract_string semantics on dirty data. */
  private[queries] def sharedParsed(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"events:parsed:$dir") {
      Tables.events(s, dir)
        .withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("parsed",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .withColumn("k_var", expr("variant_get(try_parse_json(props), '$.k', 'int')"))
        .drop("props")
    }

  /** Semi-structured extraction: JSON props field -> grouped distribution. */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    sharedParsed(s, dir)
      .select(col("k_str").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("k").cast("int"))

  /** Per-user event funnel counters (A6 over the stream table). */
  private def userFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        unix_micros(min(col("ts"))).as("first_ts_us"),
        unix_micros(max(col("ts"))).as("last_ts_us"))
      .orderBy("user_id")

  /** Events with their gap-based session index (a new session starts
    * after >30 min of user inactivity; cumulative-sum of session starts
    * numbers the sessions) — one user_id shuffle shared by both windows,
    * reused by the session rollup and the staged funnel. */
  private def sessionedEvents(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
  }

  /** Gap-based sessionization rollup. */
  private def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionedEvents(s, dir)
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .withColumn("duration_s",
        (col("end_us") - col("start_us")) / lit(1e6))
      .orderBy("user_id", "session_idx")

  /** ORDERED staged funnel per session (view -> click-after-view ->
    * purchase-after-that-click): unlike `q_events_funnel`'s lifetime
    * counters, stage order matters — a click before any view does not
    * count. Running prefix-minima over the session window encode the
    * stage machine without self-joins: a click qualifies iff a view
    * precedes it in the session (the running first-view is non-null), a
    * purchase iff a qualifying click precedes it. Three chained window
    * columns share ONE user_id shuffle with the sessionizer; the rollup
    * is two aggregations. Rates divide exact counts. */
  private def funnelStages(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val staged = sessionedEvents(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("fv",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("qc",
        min(when(col("event_type") === "click" && col("fv").isNotNull,
          col("ts_us"))).over(w))
      .withColumn("qp",
        min(when(col("event_type") === "purchase" && col("qc").isNotNull,
          col("ts_us"))).over(w))
    val sess = staged.groupBy("user_id", "session_idx")
      .agg(
        max(when(col("fv").isNotNull, 1).otherwise(0)).as("reached_view"),
        max(when(col("qc").isNotNull, 1).otherwise(0)).as("reached_click"),
        max(when(col("qp").isNotNull, 1).otherwise(0)).as("reached_purchase"))
    sess.agg(
        count(lit(1)).as("n_sessions"),
        sum(col("reached_view").cast("long")).as("n_view"),
        sum(col("reached_click").cast("long")).as("n_view_click"),
        sum(col("reached_purchase").cast("long")).as("n_view_click_purchase"))
      .select(col("n_sessions"), col("n_view"), col("n_view_click"),
        col("n_view_click_purchase"),
        (col("n_view").cast("double") / col("n_sessions")).as("view_rate"),
        (col("n_view_click").cast("double") / col("n_view")).as("click_through"),
        (col("n_view_click_purchase").cast("double") / col("n_view_click"))
          .as("purchase_through"))
  }

  /** Rate-spike detection — the ingest-anomaly monitor: each (hour,
    * type) event count compared against its trailing mean over the
    * previous three OBSERVED hours, flag when count > 2x that mean, with
    * the comparison held in the integer domain (n*3 > trailing_sum*2 —
    * no float mean ever materializes). One tumbling aggregation, then a
    * bounded window per event_type (type cardinality is bounded, hours
    * per type are the rows — the window never sees raw events). */
  private def rateSpikes(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_us")
      .rowsBetween(-3, -1)
    hourly
      .withColumn("trailing_n", sum(col("n")).over(w))
      .withColumn("trailing_hours", count(col("n")).over(w))
      .filter(col("trailing_hours") === 3)
      .withColumn("spike", col("n") * 3 > col("trailing_n") * 2)
      .select("hour_us", "event_type", "n", "trailing_n", "spike")
      .orderBy("event_type", "hour_us")
  }

  /** Built-in session_window aggregation (Spark 3.2+): sessions are
    * [first_ts, last_ts + gap) intervals merged while events arrive
    * within the gap; the batch twin of the stateful
    * flatMapGroupsWithState sessionization in [[graft.streaming.Sessionize]]
    * (which uses a strict > gap cut — session_window's interval merge
    * makes an exactly-gap-separated event start a NEW session, which the
    * oracle replays with >=). */
  private def sessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "start_us")

  /** Schema-bound JSON parsing (from_json with an explicit struct schema,
    * vs. the path-extraction in q_events_json) -> typed numeric column. */
  private def fromJson(s: SparkSession, dir: String): DataFrame =
    sharedParsed(s, dir)
      .groupBy((col("parsed.k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("parsed.k")).as("k_sum"))
      .orderBy("k_mod")

  /** VARIANT path (Spark 4): try_parse_json -> open-schema semi-structured
    * column, typed extraction with variant_get. Unlike from_json (closed
    * struct schema) the variant carries the full document, so late-arriving
    * fields survive ingestion — the semi-structured pattern for training
    * metadata whose schema drifts. Extraction stays codegen-friendly. */
  private def variantExtract(s: SparkSession, dir: String): DataFrame =
    sharedParsed(s, dir)
      .select(col("k_var").as("k"))
      .filter(col("k") >= 50)
      .groupBy((col("k") % 7).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy("k_mod")

  /** Batch twin of the watermarked stream-stream interval join
    * ([[graft.streaming.EventStream.intervalJoin]]): for every view, the
    * clicks by the same user within 30 minutes after it. The join
    * comparison runs on epoch-microsecond integers so both engines (and
    * the streaming version) agree exactly; the equi-key is user_id, so at
    * scale this is one co-partitioned shuffle with the interval predicate
    * applied post-join, not a range join. */
  private def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("view_ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_ts_us"))
    views.join(clicks, Seq("user_id"))
      .filter(col("click_ts_us") >= col("view_ts_us") &&
        col("click_ts_us") <= col("view_ts_us") + lit(1800L * 1000000L))
      .select("user_id", "view_id", "click_id", "view_ts_us", "click_ts_us")
      .orderBy("view_id", "click_id")
  }

  /** Batch twin of the CHAINED stateful streaming query
    * ([[graft.streaming.EventStream.joinThenTumbling]]): in-window
    * (view, click) pairs counted per view hour. */
  private def joinTumbling(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    views.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 minutes"))
      .groupBy(unix_micros(date_trunc("hour", col("view_ts"))).as("window_start_us"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("window_start_us")
  }

  /** Batch twin of the LEFT-OUTER watermarked stream-stream join
    * ([[graft.streaming.EventStream.intervalJoinOuter]]): every view with
    * its in-window clicks, or null click columns if none — the
    * funnel-drop-off query. Same co-partitioned user_id equi-join as the
    * inner twin; the outer side adds no shuffle. */
  private def streamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("view_ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        unix_micros(col("ts")).as("click_ts_us"))
    views.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts_us") >= col("view_ts_us") &&
          col("click_ts_us") <= col("view_ts_us") + lit(1800L * 1000000L),
        "left_outer")
      .select("user_id", "view_id", "click_id", "view_ts_us", "click_ts_us")
      .orderBy("view_id", "click_id")
  }

  /** Conversion-latency histogram: view->click delay for in-window
    * matched pairs, bucketed into fixed 5-minute bins — the latency
    * distribution every funnel dashboard plots. Bin arithmetic is pure
    * integer (microsecond delta div 300e6), share divides two exact
    * counts; rides the same co-partitioned join as `q_stream_join`. */
  private def conversionLag(s: SparkSession, dir: String): DataFrame = {
    val joined = streamJoin(s, dir)
      .withColumn("lag_bin",
        expr("(click_ts_us - view_ts_us) div 300000000").cast("int"))
    val total = joined.agg(count(lit(1)).as("total"))
    joined.groupBy("lag_bin")
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_pairs").cast("double") / col("total"))
      .drop("total")
      .orderBy("lag_bin")
  }

  /** Batch twin of the stream-static enrichment join
    * ([[graft.streaming.EventStream.enrichBySegment]]): events enriched
    * with the broadcast customer dim, revenue rolled up by market
    * segment. */
  private def streamEnrich(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("segment")

  /** Batch twin of the streaming Misra–Gries frequent-items summary
    * ([[graft.streaming.EventStream.hittersByType]]): per event_type, the
    * props key values through the bounded-memory aggregate. Capacity
    * (128) exceeds the key-value space (the 0..99 generator domain), so
    * the summary equals the exact counts at any partitioning — the
    * regime this oracle pins; StreamingSpec asserts the streaming
    * complete-mode run over the same file is row-identical. */
  private def streamHitters(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").as("item"))
      .groupBy("event_type")
      .agg(graft.functions.HeavyHitters.heavyHitters(col("item"), 128).as("hh"))
      .select(col("event_type"), posexplode(col("hh")).as(Seq("pos", "t")))
      .select(col("event_type"),
        (col("pos") + 1).cast("int").as("rank"),
        col("t.item").as("item"),
        col("t.count_est").as("count_est"))
      .orderBy("event_type", "rank")

  /** Event-time AS-OF join: every click matched to the LATEST view by
    * the same user at-or-before the click. Implemented with the
    * union-tag + carry-forward pattern — tag views 0 / clicks 1, one
    * window over (user, ts, tag) carries the last non-null view forward,
    * then keep click rows. ONE shuffle on user_id, no range join, no
    * per-key loop; at 100 TB this beats a (user, view x click) pair join
    * because each event row is touched exactly once. Views are deduped
    * to one per (user, ts) (max event_id) so the at-the-same-instant
    * match is deterministic in both engines; the oracle is DuckDB's
    * NATIVE `ASOF LEFT JOIN` — agreement proves the window encoding
    * implements real as-of semantics, unmatched clicks carry NULLs. */
  private def asofEvent(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("click_id"))
    val tagged = views
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        col("view_id"), lit(null).cast("long").as("click_id"))
      .unionByName(clicks
        .select(col("user_id"), col("ts_us"), lit(1).as("tag"),
          lit(null).cast("long").as("view_id"), col("click_id")))
    val cw = Window.partitionBy("user_id").orderBy(col("ts_us"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("m_view_id", last(col("view_id"), ignoreNulls = true).over(cw))
      .withColumn("m_view_ts",
        last(when(col("view_id").isNotNull, col("ts_us")), ignoreNulls = true).over(cw))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("click_id"), col("ts_us").as("click_ts_us"),
        col("m_view_id").as("view_id"), col("m_view_ts").as("view_ts_us"))
      .orderBy("user_id", "click_id")
  }

  /** The SAME event-time as-of semantics as [[asofEvent]], executed by
    * the library's NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]]): the planner co-partitions clicks
    * and views on user and sorts each partition by (user, time), then a
    * two-pointer merge streams both sides once, holding ONE buffered
    * view row — no union materialization, no window-frame state. Both
    * formulations are pinned to the same DuckDB native `ASOF LEFT JOIN`
    * oracle, and ExtensionsSpec proves the plan actually contains
    * AsOfJoinExec and that the two implementations agree row-for-row. */
  private def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"),
        unix_micros(col("ts")).as("view_ts_us"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("click_ts_us"),
        col("event_id").as("click_id"))
    (clicks, views)
  }

  private def asofExec(s: SparkSession, dir: String): DataFrame = {
    val (clicks, views) = asofSides(s, dir)
    graft.plans.AsOfJoin.join(clicks, views,
        "user_id", "v_user", "click_ts_us", "view_ts_us")
      .select("user_id", "click_id", "click_ts_us", "view_id", "view_ts_us")
      .orderBy("user_id", "click_id")
  }

  /** The FORWARD direction of the native operator (earliest view
    * at-or-after each click — attribution by the next impression), pinned
    * to DuckDB's native forward ASOF (`c.ts <= v.ts`). Same merge, same
    * plan shape; the direction only flips which side of the pointer the
    * candidate sits on. */
  private def asofFwd(s: SparkSession, dir: String): DataFrame = {
    val (clicks, views) = asofSides(s, dir)
    graft.plans.AsOfJoin.join(clicks, views,
        "user_id", "v_user", "click_ts_us", "view_ts_us",
        direction = "forward")
      .select("user_id", "click_id", "click_ts_us", "view_id", "view_ts_us")
      .orderBy("user_id", "click_id")
  }

  /** The TOLERANCE path of the native operator under the oracle gate:
    * backward as-of bounded to 30 minutes — merge_asof semantics: the
    * match is still the LATEST at-or-before; if it falls outside the
    * tolerance the row gets NULLs (it does NOT fall back to an earlier
    * view). The oracle is the native ASOF join with the window applied
    * afterwards — exactly that semantics. */
  private val AsofTolUs: Long = 30L * 60 * 1000000
  private def asofTol(s: SparkSession, dir: String): DataFrame = {
    val (clicks, views) = asofSides(s, dir)
    graft.plans.AsOfJoin.join(clicks, views,
        "user_id", "v_user", "click_ts_us", "view_ts_us",
        toleranceUs = AsofTolUs)
      .select("user_id", "click_id", "click_ts_us", "view_id", "view_ts_us")
      .orderBy("user_id", "click_id")
  }

  /** Cohort retention matrix — users grouped by FIRST-event day, then
    * for each day offset k: how many of that cohort were active again
    * (the activation/retention curve every product and data-freshness
    * dashboard draws). Exact distinct counts (a user active twice on
    * day k counts once), retention divides two exact longs. Shape: one
    * user-key aggregate for cohort assignment, broadcast back over the
    * events scan, then a (cohort, k) aggregation whose cardinality is
    * days² — tiny at any event volume. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = e.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(countDistinct("user_id").as("cohort_size"))
    e.join(broadcast(cohorts), Seq("user_id"))
      .withColumn("k", datediff(col("d"), col("cohort_day")))
      .groupBy("cohort_day", "k")
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day").cast("string").as("cohort_day"), col("k"),
        col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_day", "k")
  }

  /** Time-weighted average value per user (the TWAP shape): each event's
    * value holds from its timestamp until the next event, so the mean is
    * duration-weighted — the correct aggregate for sampled state (price,
    * queue depth, battery level), where the plain AVG over-counts
    * burst-sampled periods. EXACT: values become integer cents, weights
    * are integer µs deltas, the numerator Σ cents·Δus accumulates in
    * DECIMAL(38,0)/HUGEINT, and the ONE double appears in the final
    * division. The last event carries no duration (standard left-closed
    * convention); single-event users yield null. Shares the per-user
    * lag partitioning every sessionization query uses. */
  private def twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("next_us",
        lead(unix_micros(col("ts")), 1).over(w))
      .withColumn("dur_us", col("next_us") - unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("dur_us")).as("span_us"),
        sum((col("cents") * col("dur_us")).cast("decimal(38,0)")).as("num"))
      .select(col("user_id"), col("n_events"),
        coalesce(col("span_us"), lit(0L)).as("span_us"),
        when(col("span_us").isNull || col("span_us") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            (col("span_us").cast("double") * 100), 6)).as("twap"))
      .orderBy("user_id")
  }

  /** EXACT running distinct count per user — how many distinct event
    * types each user has touched so far at every event (the
    * feature-engineering "breadth so far" signal, usually approximated
    * with sketches): a row is its type's first occurrence iff
    * row_number over (user, type) is 1, and the running sum of those
    * flags IS the running distinct count — two window passes, no
    * distinct-aggregate state, exact at any scale. Ties broken by
    * event_id so both engines order identically. */
  private def runningDistinct(s: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_types", sum(col("first_seen")).over(wRun))
      .select("user_id", "event_id", "event_type", "n_distinct_types")
      .orderBy("user_id", "event_id")
  }

  /** Tolerance in µs for the nearest as-of join (30 minutes). */
  private val NearTolUs = 1800000000L

  /** NEAREST as-of join with tolerance (pandas merge_asof
    * direction='nearest'): each click matched to the closest view by
    * |Δts| within 30 min, per user — backward wins ties (the earlier
    * view), the deterministic rule both engines replay. Built from TWO
    * carry passes over the SAME union-tagged frame and user_id window
    * partitioning `q_asof_event` uses (backward = last-at-or-before,
    * forward = first-after), so the whole nearest join costs one
    * user_id shuffle and touches each event row twice — never a range
    * join, never a per-key loop. */
  private def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("click_id"))
    val tagged = views
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        col("view_id"), lit(null).cast("long").as("click_id"))
      .unionByName(clicks
        .select(col("user_id"), col("ts_us"), lit(1).as("tag"),
          lit(null).cast("long").as("view_id"), col("click_id")))
    val ord = Window.partitionBy("user_id").orderBy(col("ts_us"), col("tag"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wf = ord.rowsBetween(0, Window.unboundedFollowing)
    val vTs = when(col("view_id").isNotNull, col("ts_us"))
    val m = tagged
      .withColumn("b_view_id", last(col("view_id"), ignoreNulls = true).over(wb))
      .withColumn("b_view_ts", last(vTs, ignoreNulls = true).over(wb))
      .withColumn("f_view_id", first(col("view_id"), ignoreNulls = true).over(wf))
      .withColumn("f_view_ts", first(vTs, ignoreNulls = true).over(wf))
      .filter(col("tag") === 1)
    val db = col("ts_us") - col("b_view_ts")
    val df = col("f_view_ts") - col("ts_us")
    val bOk = col("b_view_ts").isNotNull && db <= NearTolUs
    val fOk = col("f_view_ts").isNotNull && df <= NearTolUs
    val useB = bOk && (!fOk || db <= df)
    m.select(col("user_id"), col("click_id"), col("ts_us").as("click_ts_us"),
        when(useB, col("b_view_id")).when(fOk, col("f_view_id")).as("view_id"),
        when(useB, col("b_view_ts")).when(fOk, col("f_view_ts")).as("view_ts_us"),
        when(useB, db).when(fOk, df).as("delta_us"),
        when(useB, "backward").when(fOk, "forward").as("direction"))
      .orderBy("user_id", "click_id")
  }

  /** Markov transition matrix over per-user event sequences: counts and
    * row-normalized probabilities of each (prev_type -> next_type) step,
    * the sequence-model statistic behind funnel diagnosis and synthetic
    * session generation. One lag window on the user_id shuffle (the same
    * partitioning every sessionization query uses), then a type-pair
    * aggregation whose result is at most |types|^2 rows; row totals
    * broadcast back. p divides two exact longs, so the doubles are
    * engine-identical. */
  private def transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = steps
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("prev_type").agg(sum("n").as("row_total"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .withColumn("p", col("n").cast("double") / col("row_total"))
      .select("prev_type", "next_type", "n", "row_total", "p")
      .orderBy("prev_type", "next_type")
  }

  override def shared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "events_parsed_props" -> sharedParsed,
  )

  /** Top event PATHS — sequential-pattern mining one step up from the
    * Markov transition matrix (`q_event_transitions` sees only pairs;
    * funnels care about longer journeys): each user's time-ordered
    * event-type sequence yields its 3-gram paths, counted corpus-wide,
    * top-20 with a deterministic (count desc, path asc) cut.
    *
    * Shape at scale: ONE user-keyed aggregation builds the ordered
    * sequence in-row (collect_list + sort_array — bounded by per-user
    * event count, the sessionize envelope), the 3-gram fan-out is
    * in-row, path counts combine map-side, and the final cut is
    * TakeOrdered — no global sort, no second user shuffle. */
  private def eventPaths(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .withColumn("types", expr("transform(evs, e -> e.event_type)"))
      .filter(size(col("types")) >= 3) // sequence(1, 0) runs DESCENDING
      .select(explode(expr(
        """transform(sequence(1, size(types) - 2), i ->
          |  concat_ws('>', element_at(types, i), element_at(types, i + 1),
          |            element_at(types, i + 2)))""".stripMargin)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(20)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_paths" -> eventPaths,
    "q_events_variant" -> variantExtract,
    "q_events_from_json" -> fromJson,
    "q_events_tumbling" -> tumbling,
    "q_events_sliding" -> sliding,
    "q_rate_spikes" -> rateSpikes,
    "q_events_json" -> jsonExtract,
    "q_events_funnel" -> userFunnel,
    "q_sessionize" -> sessionize,
    "q_funnel_stages" -> funnelStages,
    "q_session_window" -> sessionWindow,
    "q_stream_join" -> streamJoin,
    "q_stream_join_outer" -> streamJoinOuter,
    "q_join_tumbling" -> joinTumbling,
    "q_conversion_lag" -> conversionLag,
    "q_stream_enrich" -> streamEnrich,
    "q_stream_hitters" -> streamHitters,
    "q_asof_event" -> asofEvent,
    "q_asof_exec" -> asofExec,
    "q_asof_fwd" -> asofFwd,
    "q_asof_tol" -> asofTol,
    "q_asof_nearest" -> asofNearest,
    "q_running_distinct" -> runningDistinct,
    "q_twap" -> twap,
    "q_cohort_retention" -> cohortRetention,
    "q_event_transitions" -> transitions,
  )

  override def oracle: Map[String, String] = Map(
    // DuckDB sums BIGINT into HUGEINT -> cast row_total back; p is a ratio
    // of two exact integers so the double is engine-identical
    "q_event_paths" ->
      """WITH o AS (SELECT user_id,
        |    list(event_type ORDER BY ts, event_id) AS types
        |  FROM events GROUP BY 1),
        |p AS (SELECT types[i] || '>' || types[i+1] || '>' || types[i+2] AS path
        |      FROM (SELECT types, unnest(generate_series(1, len(types) - 2)) AS i
        |            FROM o WHERE len(types) >= 3))
        |SELECT path, count(*) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "q_event_transitions" ->
      """WITH steps AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
        |SELECT prev_type, next_type, n, row_total,
        |  CAST(n AS DOUBLE) / row_total AS p
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,
    "q_events_variant" ->
      """WITH k AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT k % 7 AS k_mod, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum
        |FROM k WHERE k >= 50 GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "q_events_from_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "q_events_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,

    // each event is in the window starting at its truncated hour and the
    // one before it (2h window, 1h slide) -> two shifted tumbling passes
    "q_events_sliding" ->
      """SELECT epoch_us(date_trunc('hour', ts)) - o * 3600000000 AS window_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
        |GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,

    "q_events_json" ->
      """SELECT json_extract_string(props, '$.k') AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY CAST(k AS INTEGER)""".stripMargin,

    "q_events_funnel" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  epoch_us(min(ts)) AS first_ts_us, epoch_us(max(ts)) AS last_ts_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_join" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_ts_us
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
        |  FROM events WHERE event_type = 'click')
        |SELECT user_id, view_id, click_id, view_ts_us, click_ts_us
        |FROM v JOIN c USING (user_id)
        |WHERE click_ts_us BETWEEN view_ts_us AND view_ts_us + 1800 * 1000000
        |ORDER BY view_id, click_id""".stripMargin,

    // the same session CTEs as q_sessionize, then three chained running
    // prefix-minima (the stage machine) and two rollups; rates divide
    // exact counts
    "q_funnel_stages" ->
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS ts_us,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_idx
        |  FROM gaps),
        |s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
        |    OVER w2 AS fv
        |  FROM sess WINDOW w2 AS (PARTITION BY user_id, session_idx
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND fv IS NOT NULL THEN ts_us END)
        |    OVER w2 AS qc
        |  FROM s1 WINDOW w2 AS (PARTITION BY user_id, session_idx
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND qc IS NOT NULL THEN ts_us END)
        |    OVER w2 AS qp
        |  FROM s2 WINDOW w2 AS (PARTITION BY user_id, session_idx
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per_sess AS (
        |  SELECT user_id, session_idx,
        |    max(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS rv,
        |    max(CASE WHEN qc IS NOT NULL THEN 1 ELSE 0 END) AS rc,
        |    max(CASE WHEN qp IS NOT NULL THEN 1 ELSE 0 END) AS rp
        |  FROM s3 GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |  CAST(sum(rv) AS BIGINT) AS n_view,
        |  CAST(sum(rc) AS BIGINT) AS n_view_click,
        |  CAST(sum(rp) AS BIGINT) AS n_view_click_purchase,
        |  CAST(sum(rv) AS DOUBLE) / count(*) AS view_rate,
        |  CAST(sum(rc) AS DOUBLE) / sum(rv) AS click_through,
        |  CAST(sum(rp) AS DOUBLE) / sum(rc) AS purchase_through
        |FROM per_sess""".stripMargin,

    "q_conversion_lag" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_ts_us
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT CAST((click_ts_us - view_ts_us) // 300000000 AS INTEGER) AS lag_bin
        |  FROM v JOIN c USING (user_id)
        |  WHERE click_ts_us BETWEEN view_ts_us AND view_ts_us + 1800 * 1000000)
        |SELECT lag_bin, count(*) AS n_pairs,
        |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM p) AS share
        |FROM p GROUP BY lag_bin ORDER BY lag_bin""".stripMargin,

    // trailing window over the previous three OBSERVED hours per type;
    // the spike rule compares integers (n*3 > trailing*2), never a mean
    "q_rate_spikes" ->
      """WITH h AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT hour_us, event_type, n,
        |    CAST(sum(n) OVER tw AS BIGINT) AS trailing_n,
        |    count(n) OVER tw AS th
        |  FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour_us
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        |SELECT hour_us, event_type, n, trailing_n,
        |  n * 3 > trailing_n * 2 AS spike
        |FROM w WHERE th = 3
        |ORDER BY event_type, hour_us""".stripMargin,

    "q_join_tumbling" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, ts AS view_ts, epoch_us(ts) AS vus
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS cus
        |  FROM events WHERE event_type = 'click')
        |SELECT epoch_us(date_trunc('hour', view_ts)) AS window_start_us,
        |  count(*) AS n_pairs
        |FROM v JOIN c USING (user_id)
        |WHERE cus BETWEEN vus AND vus + 1800 * 1000000
        |GROUP BY 1 ORDER BY window_start_us""".stripMargin,

    "q_stream_join_outer" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_ts_us
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS click_user, epoch_us(ts) AS click_ts_us
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id, view_ts_us, click_ts_us
        |FROM v LEFT JOIN c
        |  ON v.user_id = c.click_user
        |  AND c.click_ts_us BETWEEN v.view_ts_us AND v.view_ts_us + 1800 * 1000000
        |ORDER BY view_id, click_id""".stripMargin,

    // exact distinct-user counts per (first-event day, day offset);
    // retention divides two exact longs
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1),
        |sz AS (SELECT cohort_day, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
        |       FROM coh GROUP BY 1),
        |act AS (
        |  SELECT cohort_day, date_diff('day', cohort_day, d) AS k,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |  FROM e JOIN coh ON e.user_id = coh.user_id
        |  GROUP BY 1, 2)
        |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, CAST(k AS INTEGER) AS k,
        |  n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM act JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, k""".stripMargin,

    // integer cents x integer microsecond weights; HUGEINT numerator,
    // one double division at the end
    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(ts) AS t_us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(next_us - t_us) AS BIGINT) AS span_us,
        |    sum(CAST(cents AS HUGEINT) * (next_us - t_us)) AS num
        |  FROM e GROUP BY 1)
        |SELECT user_id, n_events, coalesce(span_us, 0) AS span_us,
        |  CASE WHEN span_us IS NULL OR span_us = 0 THEN NULL
        |       ELSE round(CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |              / (CAST(span_us AS DOUBLE) * 100), 6) END AS twap
        |FROM a ORDER BY user_id""".stripMargin,

    // first-occurrence flags summed over the running frame = exact
    // running distinct; event_id tiebreaks make both orderings identical
    "q_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY ts, event_id) = 1
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct_types
        |FROM f ORDER BY user_id, event_id""".stripMargin,

    // nearest-with-tolerance: the same union+window encoding, replayed
    // with both carry directions; backward wins ties
    "q_asof_nearest" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |tagged AS (
        |  SELECT user_id, ts_us, 0 AS tag, view_id, CAST(NULL AS BIGINT) AS click_id FROM v
        |  UNION ALL
        |  SELECT user_id, ts_us, 1, NULL, click_id FROM c),
        |m AS (
        |  SELECT *,
        |    last_value(view_id IGNORE NULLS) OVER wb AS b_view_id,
        |    last_value(CASE WHEN view_id IS NOT NULL THEN ts_us END IGNORE NULLS)
        |      OVER wb AS b_view_ts,
        |    first_value(view_id IGNORE NULLS) OVER wf AS f_view_id,
        |    first_value(CASE WHEN view_id IS NOT NULL THEN ts_us END IGNORE NULLS)
        |      OVER wf AS f_view_ts
        |  FROM tagged
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY ts_us, tag
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY ts_us, tag
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |pick AS (
        |  SELECT user_id, click_id, ts_us AS click_ts_us,
        |    b_view_id, b_view_ts, f_view_id, f_view_ts,
        |    (b_view_ts IS NOT NULL AND ts_us - b_view_ts <= 1800000000) AS b_ok,
        |    (f_view_ts IS NOT NULL AND f_view_ts - ts_us <= 1800000000) AS f_ok
        |  FROM m WHERE tag = 1),
        |sel AS (
        |  SELECT *, (b_ok AND (NOT f_ok OR click_ts_us - b_view_ts
        |                       <= f_view_ts - click_ts_us)) AS use_b
        |  FROM pick)
        |SELECT user_id, click_id, click_ts_us,
        |  CASE WHEN use_b THEN b_view_id WHEN f_ok THEN f_view_id END AS view_id,
        |  CASE WHEN use_b THEN b_view_ts WHEN f_ok THEN f_view_ts END AS view_ts_us,
        |  CASE WHEN use_b THEN click_ts_us - b_view_ts
        |       WHEN f_ok THEN f_view_ts - click_ts_us END AS delta_us,
        |  CASE WHEN use_b THEN 'backward' WHEN f_ok THEN 'forward' END AS direction
        |FROM sel ORDER BY user_id, click_id""".stripMargin,

    // forward direction: DuckDB's ASOF picks the NEAREST row in the
    // inequality's direction — `<=` gives earliest-at-or-after
    "q_asof_fwd" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, c.click_ts_us,
        |  v.view_id, v.ts_us AS view_ts_us
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.click_ts_us <= v.ts_us
        |ORDER BY c.user_id, click_id""".stripMargin,

    // tolerance: merge_asof semantics — the latest-at-or-before match is
    // REJECTED (nulls), not replaced, when it falls outside the window
    "q_asof_tol" ->
      s"""WITH v AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
         |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |c AS (
         |  SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
         |  FROM events WHERE event_type = 'click'),
         |j AS (
         |  SELECT c.user_id AS user_id, c.click_id, c.click_ts_us,
         |    v.view_id, v.ts_us AS view_ts_us
         |  FROM c ASOF LEFT JOIN v
         |    ON c.user_id = v.user_id AND c.click_ts_us >= v.ts_us)
         |SELECT user_id, click_id, click_ts_us,
         |  CASE WHEN click_ts_us - view_ts_us <= $AsofTolUs THEN view_id END
         |    AS view_id,
         |  CASE WHEN click_ts_us - view_ts_us <= $AsofTolUs THEN view_ts_us END
         |    AS view_ts_us
         |FROM j ORDER BY user_id, click_id""".stripMargin,

    // the native AsOfJoinExec operator answers to the SAME oracle as the
    // union+window encoding — DuckDB's native ASOF LEFT JOIN
    "q_asof_exec" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, c.click_ts_us,
        |  v.view_id, v.ts_us AS view_ts_us
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.click_ts_us >= v.ts_us
        |ORDER BY c.user_id, click_id""".stripMargin,

    // DuckDB's NATIVE asof join is the oracle for the union+window
    // encoding — the inequality in the ON clause is the as-of condition
    "q_asof_event" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id AS user_id, c.click_id, c.click_ts_us,
        |  v.view_id, v.ts_us AS view_ts_us
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.click_ts_us >= v.ts_us
        |ORDER BY c.user_id, click_id""".stripMargin,

    "q_stream_enrich" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    // exact-regime truth for the streaming Misra-Gries summary: capacity
    // covers the props key-value domain, so summary == group-by counts
    "q_stream_hitters" ->
      """WITH i AS (
        |  SELECT event_type, json_extract_string(props, '$.k') AS item
        |  FROM events),
        |c AS (SELECT event_type, item, count(*) AS cnt FROM i GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, item, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt DESC, item ASC) AS rn
        |  FROM c)
        |SELECT event_type, CAST(rn AS INTEGER) AS rank, item,
        |  CAST(cnt AS BIGINT) AS count_est
        |FROM r ORDER BY event_type, rank""".stripMargin,

    // session_window parity: interval ends are exclusive, so an event
    // arriving at EXACTLY prev_ts + gap starts a new session (>=, where
    // q_sessionize's stateful cut uses >); end = last event + gap
    "q_session_window" ->
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts, value,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |flags AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN gap_us IS NULL OR gap_us >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM gaps),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flags)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts)) + 1800 * 1000000 AS end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    "q_sessionize" ->
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |flags AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM gaps),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_idx
        |  FROM flags)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
        |  (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS duration_s
        |FROM sessions GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
  )
}
