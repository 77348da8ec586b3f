package graft

import org.apache.spark.sql.functions._

import graft.ops.Perceptron

/** Learning laws for the exact-integer batch perceptron — the corpus
  * query proves cross-engine replay; these prove the learner LEARNS. */
class PerceptronSpec extends SparkSuite {

  import spark.implicits._

  test("planted linearly separable data: training accuracy climbs to 1.0") {
    // y = sign(2*x1 - x2 + 5), points on an integer grid off the margin
    val rows = for {
      x1 <- -20L to 20L; x2 <- -20L to 20L
      m = 2 * x1 - x2 + 5 if math.abs(m) >= 3
    } yield (if (m > 0) 1L else -1L, 1L, x1, x2)
    val f = rows.toDF("y", "x0", "x1", "x2")
    val hist = Perceptron.train(f, Seq("x0", "x1", "x2"), "y", rounds = 30)
    def acc(w: Array[Long]): Double = {
      val good = f.filter(col("y") * Perceptron.margin(Seq("x0", "x1", "x2"), w) > 0)
        .count()
      good.toDouble / rows.size
    }
    val accFinal = acc(hist.last)
    assert(accFinal >= 0.97, s"final accuracy $accFinal")
    assert(accFinal >= acc(hist.head) - 1e-9, "training should not get worse than round 1")
  }

  test("round-1 weights are the exact class sum (w0 = 0 misclassifies all)") {
    val f = Seq((1L, 1L, 3L), (-1L, 1L, 7L), (1L, 1L, 2L))
      .toDF("y", "x0", "x1")
    val w1 = Perceptron.train(f, Seq("x0", "x1"), "y", rounds = 1).head
    assert(w1.toSeq == Seq(1L, -2L)) // sum y*x0 = 1-1+1, sum y*x1 = 3-7+2
  }

  test("aucByScore equals the O(n^2) pairwise definition, ties half-credited") {
    val rnd = new scala.util.Random(23)
    // heavy ties: scores from a small domain
    val rows = (0 until 400).map(_ => (rnd.nextInt(12).toLong, rnd.nextBoolean()))
    val df = rows.toDF("s", "pos").repartition(5)
    val r = graft.ops.Eval.aucByScore(df, "s", "pos").head()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = pos.map(p => neg.map(n =>
      if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
    assert(r.getAs[Long]("n_pos") == pos.size.toLong)
    assert(r.getAs[Long]("n_neg") == neg.size.toLong)
    assert(r.getAs[Long]("u2") == u2)
    assert(math.abs(r.getAs[Double]("auc") -
      u2.toDouble / (2.0 * pos.size * neg.size)) < 1e-6)
  }

  test("weights are invariant to partitioning (integer sums commute)") {
    val rows = (0L until 500L).map(i =>
      (if (i % 3 == 0) 1L else -1L, 1L, i % 17, (i * i) % 23))
    val a = Perceptron.train(
      rows.toDF("y", "x0", "x1", "x2").repartition(1),
      Seq("x0", "x1", "x2"), "y", 4)
    val b = Perceptron.train(
      rows.toDF("y", "x0", "x1", "x2").repartition(32),
      Seq("x0", "x1", "x2"), "y", 4)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
