package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the 128-bit covariance-numerator aggregate: cell-for-cell
  * equality with the exploded decimal formulation it replaced, a BigInt
  * reference on sign/magnitude extremes, and the merge path under many
  * partitions. */
class CovAccumSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("corpus law: accumulator Gram equals the exploded decimal Gram") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val a = graft.ops.Similarity.covarianceNumerators(emb)
      .select("i", "j", "c", "n").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDecimal(2).toPlainString, r.getLong(3)))
      .toMap
    val b = graft.ops.Similarity.covarianceNumeratorsExploded(emb)
      .select("i", "j", "c", "n").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDecimal(2).toPlainString, r.getLong(3)))
      .toMap
    assert(a.size == b.size && a.size > 0)
    assert(a == b)
  }

  test("BigInt reference on sign/magnitude extremes, many partitions") {
    val d = 3
    val ext = 1L << 44 // the scaled-component extreme: products hit 2^88
    val vecs: Seq[Seq[Long]] = Seq(
      Seq(ext, -ext, ext),
      Seq(-ext, -ext, -ext),
      Seq(0L, 1L, -1L),
      Seq(ext - 1, 7L, -(ext - 3)),
      Seq(1L, 0L, 0L)) ++
      (1 to 40).map(k => Seq(k.toLong * 1000000007L % ext,
        -(k.toLong * 998244353L % ext), (k.toLong * 777767777L) % ext))
    val expected: Map[Int, BigInt] = {
      var m = Map.empty[Int, BigInt].withDefaultValue(BigInt(0))
      vecs.foreach { v =>
        var cell = 0
        for (i <- 0 until d; j <- i until d) {
          m = m.updated(cell, m(cell) + BigInt(v(i)) * BigInt(v(j)))
          cell += 1
        }
      }
      m
    }
    val got = vecs.toDF("xs").repartition(7)
      .agg(graft.functions.CovAccum.covAccum(col("xs"), d).as("cells"))
      .select(posexplode(col("cells")).as(Seq("k", "s")))
      .collect()
      .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    assert(got.size == d * (d + 1) / 2)
    got.foreach { case (k, s) =>
      assert(s == expected(k), s"cell $k: got $s expected ${expected(k)}")
    }
  }
}
