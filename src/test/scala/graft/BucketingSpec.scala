package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key
  * join without a shuffle exchange — the pre-partitioning strategy for
  * repeatedly-joined big tables at scale (orders/lineitem by orderkey). */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join with no shuffle exchange") {
    // warehouse dir is a static conf — the default ./spark-warehouse is
    // used and the database is dropped (CASCADE removes the files)
    val db = "graft_bucketing"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      core.Tables.orders(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      core.Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      // force a sort-merge join so the test observes bucketing, not a
      // broadcast that would hide the exchange question entirely
      val smj = spark.table(s"$db.lineitem_b")
        .hint("merge")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = smj.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the result is right
      val n = joined.count()
      assert(n == 5)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
