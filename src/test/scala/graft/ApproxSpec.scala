package graft

import org.apache.spark.sql.functions._

/** Sketch operators for the 100 TB path: HyperLogLog distinct counts and
  * approximate quantiles replace exact shuffling aggregates when the
  * cardinality is the product, not the rows. Bounds-checked against exact
  * answers at test scale (sketches are engine-specific, so no DuckDB
  * oracle — the law is the contract). */
class ApproxSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact") {
    val li = core.Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approxQuantile brackets the exact median") {
    val li = core.Tables.lineitem(spark, sf)
    val Array(approxMedian) = li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    val exact = li.selectExpr("percentile(l_quantity, 0.5)").collect()(0).getDouble(0)
    // quantities are 1..50; a 1% relative-error sketch must land within
    // a couple of integer steps of the exact median
    assert(math.abs(approxMedian - exact) <= 2.0,
      s"approx $approxMedian vs exact $exact")
  }
}
