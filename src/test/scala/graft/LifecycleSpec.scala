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
}
