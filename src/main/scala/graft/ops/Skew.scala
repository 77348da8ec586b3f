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
    * scatter rows of the same key; hashing a row-unique id keeps it
    * deterministic-in-plan with no RNG, and — unlike hashing the row's
    * columns — spreads FULLY IDENTICAL duplicate rows (repeated log lines,
    * the most common real skew shape) across buckets too, and never trips
    * over un-hashable column types (MapType). The aggregate itself is
    * salt-value-independent, so the result stays exact. */
  def saltedAgg(df: DataFrame, key: Column, dec: Column, buckets: Int): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(dec).as("partial_sum"), count(lit(1)).as("partial_n"))
    salted
      .groupBy("key")
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }

  /** Replicated-salt equi-join for a hot-keyed BIG side against a small
    * (but not broadcastable) side: big rows get a deterministic salt in
    * [0, factor), small rows replicate across ALL salts, and the join key
    * becomes (key, salt) — a hot key's rows spread over `factor` reducers
    * instead of one straggler. This is the defense when AQE's skew split
    * can't apply (it only rewrites sort-merge joins, and only when the
    * skew is visible in map output sizes — not after an upstream
    * aggregation or for hash joins).
    *
    * Result == the plain equi-join on `keys` exactly: every (big, small)
    * key match meets at exactly one salt value. Cost: the small side
    * shuffles `factor` x its size — pick factor ~ the hot-key multiplicity
    * over the average, not the partition count. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    // row-unique salt component: identical duplicate rows still scatter
    val bigSalted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(factor)))
    val smallRep = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    bigSalted.join(smallRep, keys :+ "__salt").drop("__salt")
  }
}
