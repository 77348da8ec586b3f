package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch-perceptron training in EXACT integer arithmetic —
  * the trained-classifier quality gate (the fastText / GPT-3-style
  * "learn a keep decision from weak labels" shape) built so the whole
  * training run hash-gates cross-engine.
  *
  * Reference analog: the priority classifier (`append_priorities.py:27-102`)
  * is a HAND-written rule list; a perceptron is the same linear
  * decision learned from labeled rows instead of authored. Gradient
  * methods need a float learning rate and a sigmoid (libm, add-order
  * float sums — neither replays bit-for-bit across engines); the batch
  * perceptron update
  *
  *   w_{r+1} = w_r + Σ_{misclassified i} yᵢ·xᵢ      (yᵢ ∈ {−1,+1})
  *
  * is ALL integer on integer features, so `rounds` Spark iterations
  * replay exactly as `rounds` unrolled SQL stages (the same discipline
  * as PageRank/PCA/LPA). Misclassified = yᵢ·(w_r·xᵢ) <= 0 — margin 0
  * counts as wrong, which also makes round 1 (w₀ = 0) the plain class
  * sum every engine agrees on.
  *
  * Scale shape: one round = ONE aggregation over the feature frame with
  * map-side combine (each partition collapses to d partial sums); only
  * the d-long weight vector reaches the driver (the same bounded
  * collect as the IVF centroid matrix), then re-enters the next round
  * as literals — the corpus never re-shuffles and no weight frame is
  * ever joined. Overflow headroom: |Σ y·x| <= n·max|x| per round, so
  * BIGINT holds to ~10¹⁴ rows at x <= 10⁴; past that the accumulators
  * swap to DECIMAL(38,0) with the plan unchanged.
  */
object Perceptron {

  /** `rounds` batch-perceptron updates over integer features.
    *
    * @param feats frame carrying `yCol` (+1/−1) and integer `xCols`
    * @return weight vector after each round (index 0 = after round 1)
    */
  def train(feats: DataFrame, xCols: Seq[String], yCol: String,
            rounds: Int): Seq[Array[Long]] = {
    require(rounds >= 1 && xCols.nonEmpty)
    var w = Array.fill[Long](xCols.size)(0L)
    val history = Seq.newBuilder[Array[Long]]
    for (_ <- 1 to rounds) {
      val mis = col(yCol) * margin(xCols, w) <= 0
      val upds: Seq[Column] = xCols.zipWithIndex.map { case (c, i) =>
        sum(when(mis, col(yCol) * col(c)).otherwise(lit(0L))).as(s"d$i")
      }
      val row = feats.agg(upds.head, upds.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + (if (row.isNullAt(i)) 0L else row.getLong(i))
      }
      history += w.clone()
    }
    history.result()
  }

  /** w·x as a codegen'd column over literal weights. */
  def margin(xCols: Seq[String], w: Array[Long]): Column =
    xCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)
}
