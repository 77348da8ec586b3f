package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters.heavyHitters

/** Laws for the Misra–Gries summary ([[graft.functions.MisraGriesAgg]]). */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def summarize(items: Seq[String], capacity: Int,
                        partitions: Int): Map[String, Long] =
    items.toDF("item").repartition(partitions)
      .agg(heavyHitters(col("item"), capacity).as("hh"))
      .select(explode(col("hh")).as("t"))
      .select("t.item", "t.count_est").as[(String, Long)]
      .collect().toMap

  test("exact regime: NDV <= capacity reproduces group-by counts at any partitioning") {
    val items = (0 until 3000).map(i => s"v${i % 7}")
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (p <- Seq(1, 3, 8)) {
      assert(summarize(items, capacity = 16, partitions = p) == truth,
        s"partitions=$p")
    }
  }

  test("approx regime: est <= true and true - est <= N/(capacity+1); frequent items survive") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish stream over 200 distinct items, capacity 20
    val items = (0 until 20000).map { _ =>
      val r = rnd.nextInt(1000)
      if (r < 500) s"hot_${r % 5}" else s"cold_${rnd.nextInt(195)}"
    }
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    val cap = 20
    val slack = n / (cap + 1)
    for (p <- Seq(1, 4, 16)) {
      val got = summarize(items, cap, p)
      assert(got.size <= cap)
      got.foreach { case (k, est) =>
        val t = truth(k)
        assert(est <= t, s"overcount $k: $est > $t")
        assert(t - est <= slack, s"undercount $k beyond bound: $t - $est > $slack")
      }
      // the frequent-items contract: anything above N/(cap+1) is present
      truth.filter(_._2 > slack).keys.foreach { k =>
        assert(got.contains(k), s"frequent item $k missing (partitions=$p)")
      }
    }
  }

  test("per-group buffers stay independent") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c"))
      .toDF("g", "item")
    val got = df.groupBy("g")
      .agg(heavyHitters(col("item"), 8).as("hh"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(t => t.getString(0) -> t.getLong(1)).toMap).toMap
    assert(got("g1") == Map("a" -> 2L, "b" -> 1L))
    assert(got("g2") == Map("c" -> 1L))
  }

  test("null items are skipped, not counted") {
    val got = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(heavyHitters(col("item"), 4).as("hh"))
      .select(explode(col("hh")).as("t"))
      .select("t.item", "t.count_est").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
  }

  test("output order is deterministic: count desc, then item asc") {
    val items = Seq("b", "b", "a", "a", "c")
    val got = items.toDF("item")
      .agg(heavyHitters(col("item"), 8).as("hh"))
      .select(explode(col("hh")).as("t"))
      .select("t.item").as[String].collect().toSeq
    assert(got == Seq("a", "b", "c"))
  }
}
