package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketized point-in-interval join: result-equal to the naive non-equi
  * join, planned as an equi-join (no nested-loop / cartesian), across
  * bucket widths. */
class RangeJoinSpec extends SparkSuite {

  private lazy val points = {
    val rnd = new scala.util.Random(7)
    spark.createDataFrame((1L to 400L).map(i => (i, rnd.nextInt(1000).toLong)))
      .toDF("p_id", "p")
  }
  private lazy val intervals = {
    val rnd = new scala.util.Random(11)
    spark.createDataFrame((1L to 120L).map { i =>
      val s = rnd.nextInt(950).toLong
      (i, s, s + rnd.nextInt(80).toLong)
    }).toDF("iv_id", "s", "e")
  }

  private def naive =
    points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("p_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketized range join equals the naive non-equi join at any width") {
    for (w <- Seq(1L, 13L, 64L, 4096L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("p_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$w diverged")
    }
    assert(naive.nonEmpty)
  }

  test("the bucketized plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi physical join:\n$plan")
  }

  test("inclusive bounds: boundary points match, just-outside points do not") {
    val pts = spark.createDataFrame(Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)))
      .toDF("p_id", "p")
    val iv = spark.createDataFrame(Seq((9L, 10L, 20L))).toDF("iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "p", iv, "s", "e", 7L)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  private lazy val ivA = {
    val rnd = new scala.util.Random(23)
    spark.createDataFrame((1L to 150L).map { i =>
      val s = rnd.nextInt(900).toLong
      (i, s, s + rnd.nextInt(60).toLong)
    }).toDF("a_id", "a_s", "a_e")
  }
  private lazy val ivB = {
    val rnd = new scala.util.Random(29)
    spark.createDataFrame((1L to 200L).map { i =>
      val s = rnd.nextInt(950).toLong
      (i, s, s + rnd.nextInt(40).toLong)
    }).toDF("b_id", "b_s", "b_e")
  }

  test("interval-overlap join equals the naive theta join, one row per pair") {
    val naiveOv = ivA.crossJoin(ivB)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naiveOv.nonEmpty)
    for (w <- Seq(1L, 16L, 128L, 4096L)) {
      val rows = RangeJoin
        .intervalOverlap(ivA, "a_s", "a_e", ivB, "b_s", "b_e", w)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == naiveOv, s"bucketWidth=$w diverged")
      // claimed exactly once: no duplicate pair rows even when a pair
      // shares several buckets
      assert(rows.length == rows.toSet.size, s"bucketWidth=$w duplicated pairs")
    }
  }

  test("interval-overlap plans as an equi-join, not a nested loop") {
    val plan = RangeJoin
      .intervalOverlap(ivA, "a_s", "a_e", ivB, "b_s", "b_e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join fell back to a non-equi physical join:\n$plan")
  }

  test("interval-overlap touching endpoints match; disjoint do not") {
    val a = spark.createDataFrame(Seq((1L, 10L, 20L))).toDF("a_id", "a_s", "a_e")
    val b = spark.createDataFrame(Seq(
      (1L, 20L, 30L),  // touches at 20
      (2L, 0L, 10L),   // touches at 10
      (3L, 21L, 25L),  // just outside
      (4L, 0L, 9L),    // just outside
      (5L, 12L, 14L)   // nested
    )).toDF("b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 7L)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
  }
}
