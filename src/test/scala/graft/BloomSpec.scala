package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** Laws for the bloom-pruned index membership ([[graft.ops.Bloom]]). */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def truth(index: Seq[String], batch: Seq[(Long, String)]): Map[Long, Boolean] = {
    val ix = index.toSet
    batch.map { case (id, k) => id -> !ix.contains(k) }.toMap
  }

  test("newRows equals the plain anti-join truth (mixed dup/new batch)") {
    val index = (0 until 500).map(i => s"rec_$i")
    val batch = (0 until 200).map { i =>
      // half the batch collides with the index, half is genuinely new
      (1000L + i, if (i % 2 == 0) s"rec_${i * 2}" else s"new_$i")
    }
    val got = Bloom.newRows(
        index.toDF("record"), batch.toDF("doc_id", "record"), "record")
      .select("doc_id", "is_new").as[(Long, Boolean)].collect().toMap
    assert(got == truth(index, batch))
  }

  test("no false negatives: every index key is bloom-positive") {
    val keys = (0 until 2000).map(i => s"k_$i")
    val bloom = Bloom.build(keys.toDF("k"), col("k"), expectedItems = 2000).get
    val misses = keys.toDF("k")
      .filter(!Bloom.mightContain(bloom, col("k"))).count()
    assert(misses == 0L)
  }

  test("false-positive rate stays near the sizing target") {
    val bloom = Bloom.build((0 until 10000).map(i => s"in_$i").toDF("k"),
      col("k"), expectedItems = 10000).get
    val fps = (0 until 10000).map(i => s"out_$i").toDF("k")
      .filter(Bloom.mightContain(bloom, col("k"))).count()
    // 2^23 bits / 10k items is a deeply over-provisioned bloom; anything
    // beyond 1% false positives means the hash wiring is broken
    assert(fps < 100L, s"fp count $fps out of 10000 probes")
  }

  test("plan: exactly one join; both join inputs carry a might_contain prune") {
    // Range-backed inputs: a LocalRelation source would let the optimizer
    // evaluate the bloom probes at plan time and fold them away
    val index = spark.range(100)
      .select(concat(lit("rec_"), col("id")).as("record"))
    val batch = spark.range(50)
      .select(col("id").as("doc_id"),
        concat(lit("rec_"), col("id") * 4).as("record"))
    val plan = Bloom.newRows(index, batch, "record")
      .queryExecution.executedPlan.toString
    val joins = "(?i)join".r.findAllIn(plan).length
    assert(joins >= 1, "verify join missing")
    val probes = "might_contain".r.findAllIn(plan).length
    // batch probe appears in both union branches (hit + definite-new) and
    // the reverse prune guards the index side: >= 3 occurrences
    assert(probes >= 3, s"expected bloom probes on both sides, plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("empty index: everything is new and no join is planned") {
    val index = spark.emptyDataset[String].toDF("record")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "record")
    val out = Bloom.newRows(index, batch, "record")
    assert(out.filter(col("is_new")).count() == 2L)
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("join"))
  }
}
