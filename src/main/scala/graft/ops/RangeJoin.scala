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

  /** Interval-OVERLAP join: one output row per (a, b) pair whose
    * inclusive ranges intersect ([aStart,aEnd] ∩ [bStart,bEnd] ≠ ∅).
    * Both sides explode to their touched buckets and meet on an
    * equi-key; a pair spanning several common buckets would match in
    * each, so every pair is CLAIMED exactly once — in the bucket that
    * contains the overlap's start, max(aStart, bStart). That dedup is a
    * pure predicate (no distinct, no second shuffle), the standard
    * interval-join trick.
    *
    * Bounds must be non-negative (epoch-day / epoch-second domains):
    * integral `div` truncates toward zero, so negative starts would
    * disagree with the floor-bucket assignment. Enforced here rather
    * than silently mis-bucketed. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
                      b: DataFrame, bStart: String, bEnd: String,
                      bucketWidth: Long,
                      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: String, e: String) = df
      .filter(col(s) >= 0 && col(e) >= col(s))
      .withColumn("__bucket",
        explode(sequence(expr(s"$s div $bucketWidth"),
          expr(s"$e div $bucketWidth"))))
    buckets(a, aStart, aEnd)
      .join(buckets(b, bStart, bEnd), Seq("__bucket") ++ extraKeys)
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bucket") === expr(s"greatest($aStart, $bStart) div $bucketWidth"))
      .drop("__bucket")
  }
}
