package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, bucketized for scale.
  *
  * Spark plans a bare `p BETWEEN start AND end` join as
  * BroadcastNestedLoopJoin (or a cartesian at worst) — O(points x
  * intervals) comparisons, unusable at corpus scale. The standard fix is
  * to discretize the range dimension: every interval explodes to the
  * fixed-width buckets it overlaps, every point maps to its one bucket,
  * and the join becomes an EQUI-join on bucket id followed by the exact
  * range predicate. Work becomes O(points + intervals x spread +
  * true matches), shuffled on a uniform integer key.
  *
  * `bucketWidth` trades fan-out for selectivity: intervals explode into
  * ceil(len/width)+1 rows, points into 1 — pick width ~ the typical
  * interval length so the average interval spans O(1) buckets.
  */
object RangeJoin {

  /** Join `points` (with numeric column `pCol`) to `intervals` (with
    * numeric `startCol`/`endCol`, inclusive bounds): one output row per
    * (point, containing interval). Extra key columns can be appended to
    * `extraKeys` to make the bucket join compound (point AND key equal). */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivb = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val ptb = points.withColumn("__bucket",
      floor(col(pCol) / bucketWidth).cast("long"))
    ptb.join(ivb, Seq("__bucket") ++ extraKeys)
      .filter(col(pCol) >= col(startCol) && col(pCol) <= col(endCol))
      .drop("__bucket")
  }
}
