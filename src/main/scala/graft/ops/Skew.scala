package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling (SURVEY.md §7.4): hot keys (shared EINs, state-level
  * groups) overload single reducers at scale. Salted aggregation splits
  * each key across `buckets` partial groups, aggregates, then combines —
  * two small shuffles instead of one skewed one. The result is exactly the
  * unsalted aggregate (decimal partials are exact, and sum is associative),
  * which the DuckDB oracle verifies.
  *
  * Joins with skewed keys use AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default); salting is for
  * aggregations and for joins whose skew AQE can't see (e.g. post-filter).
  */
object Skew {

  /** Two-stage salted sum/count of `dec` per `key`. The salt only needs to
    * scatter rows of the same key; hashing the full row keeps it
    * deterministic with no RNG in the plan. */
  def saltedAgg(df: DataFrame, key: Column, dec: Column, buckets: Int): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(hash(struct(df.columns.map(col): _*)), lit(buckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(dec).as("partial_sum"), count(lit(1)).as("partial_n"))
    salted
      .groupBy("key")
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
