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

  test("count-min sketch: never undercounts, heavy hitters within epsilon*N") {
    // the heavy-hitter token tracker for corpus curation: one pass, fixed
    // memory, mergeable across partitions (the 100 TB shape)
    val docs = core.Tables.documents(spark, sf)
    val toks = docs.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val eps = 0.001
    val cms = toks.stat.countMinSketch("tok", eps = eps, confidence = 0.99, seed = 42)
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"CMS undercounted $tok: $est < $cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"CMS overcount beyond eps*N for $tok: $est vs $cnt (N=$n)")
    }
  }

  test("bloom filter: no false negatives, bounded false positives") {
    // membership pruning for at-scale semi-joins: ship the small side's
    // keys as a bloom filter and pre-filter the big side before the
    // shuffle (the runtime-filter pattern)
    val cust = core.Tables.customer(spark, sf)
    val keys = cust.select(col("c_custkey")).collect().map(_.getLong(0))
    val bloom = cust.stat.bloomFilter("c_custkey", expectedNumItems = keys.length, fpp = 0.01)
    assert(keys.forall(bloom.mightContain), "bloom filter false negative")
    val probes = (1000000L until 1010000L).count(bloom.mightContain)
    assert(probes <= 300, s"false-positive rate too high: $probes / 10000")
  }
}
