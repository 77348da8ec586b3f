package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Bucketing

/** Bucketed layout guards: the co-located join must plan with ZERO
  * Exchange (that is the entire point of paying the bucket shuffle at
  * write time), bucket-key equality predicates must prune to one bucket,
  * and the join result must equal the plain join's. */
class BucketingSpec extends SparkSuite {

  private val nBuckets = 8

  private def ensureTables(): Unit = {
    if (!spark.catalog.tableExists("graft_orders_b")) {
      // the in-memory catalog forgets tables across JVMs but their
      // warehouse directories survive — clear both before recreating
      Seq("graft_orders_b", "graft_customer_b").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val dir = new java.io.File(s"spark-warehouse/$t")
        if (dir.exists()) scala.reflect.io.Directory(dir).deleteRecursively()
      }
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_orders_b", nBuckets, Seq("o_custkey"))
      Bucketing.writeBucketed(
        Tables.customer(spark, sf)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "graft_customer_b", nBuckets, Seq("o_custkey"))
    }
  }

  test("co-located join of identically-bucketed tables plans no Exchange") {
    ensureTables()
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cojoin(spark, "graft_orders_b", "graft_customer_b",
        Seq("o_custkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan.take(900))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // result equality with the plain (shuffling) join
      val got = joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === exp)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucket-key equality predicate prunes to a single bucket") {
    ensureTables()
    // autoBucketedScan=true drops the bucketed scan for exchange-free
    // queries (a filter has no exchange to avoid), which also forfeits
    // bucket pruning — force the bucketed read to measure the pruning
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val plan = spark.table("graft_orders_b")
        .filter(col("o_custkey") === 42)
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains(s"SelectedBucketsCount: 1 out of $nBuckets"),
        s"no bucket pruning in plan:\n${plan.take(1500)}")
    } finally spark.conf.set(k, saved)
  }

  test("bucketed inputs run the native as-of join with ZERO exchanges") {
    // the as-of operator only DECLARES its distribution requirement —
    // when both inputs arrive bucketed on their user keys, the planner
    // inserts no Exchange at all (the window encoding of the same
    // semantics can never skip its union shuffle)
    Seq("graft_clicks_b", "graft_views_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) scala.reflect.io.Directory(dir).deleteRecursively()
    }
    val e = Tables.events(spark, sf)
    Bucketing.writeBucketed(
      e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("click_ts_us"),
          col("event_id").as("click_id")),
      "graft_clicks_b", nBuckets, Seq("user_id"))
    Bucketing.writeBucketed(
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"),
          unix_micros(col("ts")).as("view_ts_us"))
        .agg(max(col("event_id")).as("view_id")),
      "graft_views_b", nBuckets, Seq("v_user"))
    val joined = graft.plans.AsOfJoin.join(
      spark.table("graft_clicks_b"), spark.table("graft_views_b"),
      "user_id", "v_user", "click_ts_us", "view_ts_us")
    val plan = joined.queryExecution.explainString(FormattedMode)
    assert(plan.contains("AsOfJoin"), plan.take(900))
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join still shuffles:\n${plan.take(1500)}")
    // and the exchange-free run returns the same rows as q_asof_exec
    val got = joined
      .select("user_id", "click_id", "click_ts_us", "view_id", "view_ts_us")
      .orderBy("user_id", "click_id").collect().toSeq
    val exp = SparkEntry.queries("q_asof_exec")(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == exp)
  }

  test("group-by on the bucket key reuses the bucketing without an exchange") {
    ensureTables()
    val plan = spark.table("graft_orders_b")
      .groupBy("o_custkey")
      .agg(sum("o_totalprice"))
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation still shuffles:\n${plan.take(1500)}")
  }
}
