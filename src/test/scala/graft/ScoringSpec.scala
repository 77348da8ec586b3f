package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Scoring

/** Golden-value + property tests for the scoring kernel (SURVEY.md §5):
  * expected values hand-computed from the reference's documented thresholds,
  * e.g. equity_ratio 0.15 with (healthy=0.40, distress=-0.10) ->
  * (0.40-0.15)/0.50 = 0.5. */
class ScoringSpec extends AnyFunSuite with org.scalactic.Tolerance {
  lazy val spark = SparkSuite.session
  import spark.implicits._

  // deterministic property grid (scalatestplus-scalacheck bridge is not in
  // the offline cache, so properties run over seeded samples)
  private val rng = new scala.util.Random(42)
  private def samples(n: Int, lo: Double, hi: Double): Seq[Double] =
    Seq.fill(n)(lo + (hi - lo) * rng.nextDouble())

  private def evalD(c: org.apache.spark.sql.Column): Option[Double] = {
    val r = Seq(1).toDF("x").select(c.as("v")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("interpolate: higher-is-better golden values") {
    val f = (v: Double) => evalD(Scoring.interpolate(lit(v), 0.40, -0.10))
    assert(f(0.50) === Some(0.0))   // at/above healthy
    assert(f(0.40) === Some(0.0))
    assert(f(-0.10) === Some(1.0))  // at/below distress
    assert(f(-0.50) === Some(1.0))
    assert(f(0.15).get === 0.5 +- 1e-12)  // (0.40-0.15)/0.50
  }

  test("interpolate: lower-is-better golden values") {
    val f = (v: Double) => evalD(Scoring.interpolate(lit(v), 0.20, 0.80))
    assert(f(0.10) === Some(0.0))
    assert(f(0.90) === Some(1.0))
    assert(f(0.50).get === 0.5 +- 1e-12)
    assert(evalD(Scoring.interpolate(lit(null).cast("double"), 0.20, 0.80)).isEmpty)
  }

  test("interpolate: monotone in the raw metric and bounded in [0,1]") {
    samples(20, -2.0, 2.0).zip(samples(20, -2.0, 2.0)).foreach { case (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val sLo = evalD(Scoring.interpolate(lit(lo), 0.40, -0.10)).get
      val sHi = evalD(Scoring.interpolate(lit(hi), 0.40, -0.10)).get
      assert(sLo >= sHi - 1e-12) // higher metric => lower distress
      assert(sLo >= 0.0 && sLo <= 1.0 && sHi >= 0.0 && sHi <= 1.0)
    }
  }

  test("weightedRenormMean: renormalizes over non-null indicators") {
    // all present: 0.5*0.2 + 0.3*0.6 + 0.2*1.0 = 0.48 -> 48
    val all = evalD(Scoring.weightedRenormMean(Seq(
      lit(0.2) -> 0.5, lit(0.6) -> 0.3, lit(1.0) -> 0.2))).get
    assert(all === 48.0 +- 1e-9)
    // dropping a null indicator renormalizes: (0.5*0.2 + 0.3*0.6)/0.8 = 0.35
    val some = evalD(Scoring.weightedRenormMean(Seq(
      lit(0.2) -> 0.5, lit(0.6) -> 0.3, lit(null).cast("double") -> 0.2))).get
    assert(some === 35.0 +- 1e-9)
    // all null -> null
    assert(evalD(Scoring.weightedRenormMean(Seq(
      lit(null).cast("double") -> 0.5, lit(null).cast("double") -> 0.5))).isEmpty)
  }

  test("renormalization invariance: null indicator never changes the mean of the rest") {
    samples(10, 0.0, 1.0).zip(samples(10, 0.0, 1.0)).foreach { case (x, y) =>
      val without = evalD(Scoring.weightedRenormMean(Seq(lit(x) -> 0.4, lit(y) -> 0.6))).get
      val withNul = evalD(Scoring.weightedRenormMean(Seq(
        lit(x) -> 0.4, lit(y) -> 0.6, lit(null).cast("double") -> 0.9))).get
      assert(without === withNul +- 1e-9)
    }
  }

  test("categorize bin edges") {
    val f = (v: Double) => Seq(1).toDF("x")
      .select(Scoring.categorize(lit(v)).as("c")).collect()(0).getString(0)
    assert(f(0.0) == "Healthy" && f(19.999) == "Healthy")
    assert(f(20.0) == "Watch" && f(40.0) == "Elevated")
    assert(f(60.0) == "High" && f(80.0) == "Severe" && f(100.0) == "Severe")
    val n = Seq(1).toDF("x")
      .select(Scoring.categorize(lit(null).cast("double")).as("c")).collect()(0).getString(0)
    assert(n == "Unknown")
  }

  test("floors never lower a score (max law)") {
    samples(10, 0.0, 100.0).zip(samples(10, 0.0, 100.0)).foreach { case (s, fl) =>
      val v = evalD(Scoring.applyFloor(lit(s), lit(true), lit(fl))).get
      assert(v >= s - 1e-12 && v >= fl - 1e-12)
    }
    // guard false -> unchanged
    assert(evalD(Scoring.applyFloor(lit(10.0), lit(false), lit(90.0))) === Some(10.0))
  }

  test("cagr: golden values + negative-base guard") {
    // 100 -> 121 over 2 years = 10%/yr
    assert(evalD(Scoring.cagr(lit(121.0), lit(100.0), lit(2))).get === 0.10 +- 1e-9)
    assert(evalD(Scoring.cagr(lit(-5.0), lit(100.0), lit(1))).isEmpty)  // complex guard
    assert(evalD(Scoring.cagr(lit(5.0), lit(0.0), lit(1))).isEmpty)
    assert(evalD(Scoring.cagr(lit(5.0), lit(100.0), lit(0))).isEmpty)
  }

  test("piecewise net-asset trend branches") {
    val f = (c: Double, p: Double) =>
      evalD(Scoring.piecewiseTrend(lit(c), lit(p), lit(1))).get
    assert(f(-10.0, 50.0) === -0.30 +- 1e-12)  // positive -> negative
    assert(f(-80.0, -50.0) === -0.20 +- 1e-12) // negative worsening
    assert(f(-20.0, -50.0) === 0.05 +- 1e-12)  // negative improving
    assert(f(110.0, 100.0) === 0.10 +- 1e-9)   // both positive -> CAGR
  }

  test("safeDiv, truthy, hhi, clampRatio") {
    assert(evalD(Scoring.safeDiv(lit(10.0), lit(0.0))).isEmpty)
    assert(evalD(Scoring.safeDiv(lit(10.0), lit(4.0))) === Some(2.5))
    assert(evalD(Scoring.truthy(lit("y"))) === Some(1.0))
    assert(evalD(Scoring.truthy(lit("TRUE"))) === Some(1.0))
    assert(evalD(Scoring.truthy(lit("n"))) === Some(0.0))
    // HHI of equal thirds = 3*(1/3)^2 = 1/3
    val h = evalD(Scoring.hhi(Seq(lit(1.0), lit(1.0), lit(1.0)), lit(3.0))).get
    assert(h === 1.0 / 3 +- 1e-9)
    assert(evalD(Scoring.hhi(Seq(lit(1.0)), lit(0.0))).isEmpty)
    assert(evalD(Scoring.clampRatio(lit(0.2), 0.10)) === Some(1.0))
    assert(evalD(Scoring.clampRatio(lit(0.05), 0.10)).get === 0.5 +- 1e-12)
  }
}
