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
