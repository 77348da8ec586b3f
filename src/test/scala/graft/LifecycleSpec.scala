package graft

import org.apache.spark.sql.functions._
import graft.ops.{Merge, Panel, Skew}

/** End-to-end lifecycle: the reference's integrate-with-master flow (§3.1)
  * — score the panel, select the latest year per entity, merge ~score
  * columns into a master by key, print-style distribution checks — plus
  * the salting invariance law. */
class LifecycleSpec extends SparkSuite {

  test("score -> latest-per-entity -> integrate-with-master -> distributions") {
    val scores = queries.CoreQueries.distressScores(spark, sf)
      .select(col("entity_id"), col("distress_score"), col("risk_category"),
        col("n_indicators"))
    val master = core.Tables.customer(spark, sf)
      .select(col("c_custkey").as("entity_id"), col("c_name"), col("c_mktsegment"))
    val integrated = Merge.integrate(master, scores, "entity_id",
      Seq("distress_score", "risk_category", "n_indicators"))
    // every master row survives; scored entities carry their scores
    assert(integrated.count() == master.count())
    val scored = integrated.filter(col("distress_score").isNotNull)
    assert(scored.count() > 0)
    // distribution sanity (the reference's printed value_counts step)
    val dist = integrated.groupBy("risk_category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.keySet.subsetOf(
      Set("Healthy", "Watch", "Elevated", "High", "Severe", "Unknown", null)))
    assert(dist.values.sum == master.count())
  }

  test("salted aggregation equals the direct aggregation exactly") {
    val li = core.Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(li, col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)"), 16)
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (t, n)) =>
      assert(direct(k)._1.compareTo(t) == 0, s"sum mismatch for $k")
      assert(direct(k)._2 == n)
    }
  }

  test("replicated-salt join equals the plain equi-join on skewed keys") {
    // 90% of big rows share one hot key — the single-straggler shape
    val big = spark.createDataFrame((1L to 2000L).map { i =>
      (i, if (i % 10 == 0) s"k${i % 7}" else "HOT", i * 1.5)
    }).toDF("row_id", "key", "v")
    val small = spark.createDataFrame(
      Seq(("HOT", 1L), ("k0", 2L), ("k3", 3L), ("absent", 4L)))
      .toDF("key", "dim_id")
    val plain = big.join(small, Seq("key"))
      .select("row_id", "dim_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(big, small, Seq("key"), factor = 8)
    val got = salted.select("row_id", "dim_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == plain && got.nonEmpty)
    // the join key is compound (key, salt): the hot key spreads 8 ways
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    // the other half of the skew story: saltedAgg handles skewed
    // AGGREGATIONS; skewed JOINS are AQE's job — force tiny thresholds so
    // the hot key triggers the split at test scale and prove it both ways
    // (correct result AND OptimizeSkewedJoin marking the join)
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 75% of left rows share key 0 — one reducer partition gets ~3 MB
      // while the others stay tiny
      val left = spark.range(0, 200000).select(
        when(col("id") < 150000, 0L).otherwise(col("id")).as("k"),
        concat(lit("payload_"), col("id")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS frame's AdaptiveSparkPlan is the
      // one that executes and finalizes
      val n = joined.collect().length
      // key 0 matches 150000 times; keys 150000..199999 have no dim row
      assert(n == 150000, s"unexpected join cardinality $n")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n${finalPlan.take(1500)}")
    } finally olds.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
