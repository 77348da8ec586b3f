package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scoring kernel: pure `Column => Column` combinators re-expressing the
  * reference's scalar scoring semantics (SURVEY.md §2.8) as codegen-friendly
  * Catalyst expressions. No UDFs — everything stays inside whole-stage
  * codegen and is oracle-expressible as ANSI SQL CASE/GREATEST/LEAST.
  *
  * Reference behaviors re-expressed:
  *  - safe divide: `Hummingbird_Master_engine_990.py:723-727`
  *  - linear-interpolated distress score (`_score_to_distress`):
  *    `Hummingbird_Master_engine_990.py:736-769`,
  *    `Hummingbird_Master_engine_ipeds_v5.py:457-468`
  *  - risk categorize bins: `...990.py:1201-1214`
  *  - weighted null-renormalizing mean: `...990.py:1141-1167`
  *  - completeness gate MIN_INDICATORS: `...990.py:1170-1182`
  *  - floors as conditional max: `..._ipeds_v5.py:1061-1150`
  *  - clamp ratios: `...990.py:1079,1092`; truthy flags `:1064-1066`
  */
object Scoring {

  /** NULL when denominator is NULL or zero, else num/denom.
    * (Spark already yields NULL on double /0 under ANSI-off, but the explicit
    * form keeps parity with the oracle SQL and documents intent.) */
  def safeDiv(num: Column, denom: Column): Column =
    when(denom.isNull || denom === 0d, lit(null)).otherwise(num / denom)

  /** Linear interpolation between a healthy and a distress threshold,
    * clamped to [0,1]; NULL propagates. Direction is inferred from the
    * threshold ordering:
    *  - healthy > distress (higher is better, e.g. equity ratio):
    *      v >= healthy -> 0, v <= distress -> 1, else (healthy-v)/(healthy-distress)
    *  - healthy < distress (lower is better, e.g. debt ratio): mirrored.
    */
  def interpolate(v: Column, healthy: Double, distress: Double): Column = {
    require(healthy != distress, "degenerate thresholds")
    val body =
      if (healthy > distress)
        when(v >= healthy, 0d)
          .when(v <= distress, 1d)
          .otherwise((lit(healthy) - v) / lit(healthy - distress))
      else
        when(v <= healthy, 0d)
          .when(v >= distress, 1d)
          .otherwise((v - lit(healthy)) / lit(distress - healthy))
    when(v.isNull || isnan(v), lit(null)).otherwise(body)
  }

  /** Weighted mean over the non-null inputs only, renormalizing the weights
    * (`sum(w_i*s_i)/sum(w_i)` over non-null s_i), scaled by `scale`.
    * NULL when every input is null. This is the reference's indicator→domain
    * and domain→composite aggregation (A1/A2) — a *horizontal* fold across
    * columns, so no UDAF is needed. */
  def weightedRenormMean(pairs: Seq[(Column, Double)], scale: Double = 100d): Column = {
    val num = pairs.map { case (c, w) => when(c.isNotNull, c * w).otherwise(0d) }.reduce(_ + _)
    val den = pairs.map { case (c, w) => when(c.isNotNull, lit(w)).otherwise(0d) }.reduce(_ + _)
    when(den > 0d, num / den * scale).otherwise(lit(null))
  }

  /** Count of non-null columns (A3 completeness). */
  def nonNullCount(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)

  /** Gate a score on a minimum number of scored indicators (A3):
    * `MIN_INDICATORS` semantics — fewer than `min` non-null inputs => NULL. */
  def minIndicatorsGate(score: Column, indicators: Seq[Column], min: Int): Column =
    when(nonNullCount(indicators) >= min, score).otherwise(lit(null))

  /** Risk category bins (F7): <20 Healthy, <40 Watch, <60 Elevated,
    * <80 High, else Severe; NULL -> "Unknown". */
  def categorize(score: Column): Column =
    when(score.isNull, "Unknown")
      .when(score < 20d, "Healthy")
      .when(score < 40d, "Watch")
      .when(score < 60d, "Elevated")
      .when(score < 80d, "High")
      .otherwise("Severe")

  /** Conditional score floor (F13): `max(floor, score)` when the guard holds.
    * Floors never lower a score (`..._ipeds_v5.py:71,1105`). */
  def applyFloor(score: Column, guard: Column, floor: Column): Column =
    when(guard && score.isNotNull, greatest(score, floor)).otherwise(score)

  /** Ratio clamped to [0,1] against a cap (F11): `min(1, v/cap)`; NULL
    * propagates (both Spark's and DuckDB's `least` skip NULLs, which would
    * silently turn a missing ratio into 1.0). */
  def clampRatio(v: Column, cap: Double): Column =
    when(v.isNull, lit(null)).otherwise(least(lit(1.0), v / lit(cap)))

  /** Truthy flag parse (F9/P7): 'Y','YES','1','TRUE' (any case) -> 1.0 else 0.0;
    * NULL -> NULL. */
  def truthy(c: Column): Column =
    when(c.isNull, lit(null))
      .otherwise(when(upper(trim(c)).isin("Y", "YES", "1", "TRUE"), 1.0).otherwise(0.0))

  /** Sum of components where missing components count as 0, but ALL-null
    * yields NULL — pandas `sum(skipna)` over an all-NaN slice is NaN, and
    * an indicator with no source data must drop out of the renormalizing
    * mean rather than score as 0. */
  def sumIfAny(cols: Seq[Column]): Column =
    when(coalesce(cols: _*).isNull, lit(null))
      .otherwise(cols.map(c => coalesce(c, lit(0d))).reduce(_ + _))

  /** Herfindahl–Hirschman index over component revenue shares (A7):
    * sum((comp_i/total)^2); NULL when total is null/<=0 or every component
    * is null. */
  def hhi(components: Seq[Column], total: Column): Column = {
    val shares = components.map(c => {
      val s = when(c.isNull, 0d).otherwise(c) / total
      s * s
    })
    when(total.isNull || total <= 0d || coalesce(components: _*).isNull, lit(null))
      .otherwise(shares.reduce(_ + _))
  }

  /** Annualized growth rate between two observations `gap` years apart (W2):
    * (curr/prior)^(1/gap) - 1. The reference nulls out negative-base complex
    * powers (`...990.py:751`); here any non-positive base, null, or zero gap
    * -> NULL. */
  def cagr(curr: Column, prior: Column, gap: Column): Column =
    when(curr.isNull || prior.isNull || gap.isNull || gap <= 0 ||
           curr <= 0d || prior <= 0d, lit(null))
      .otherwise(pow(curr / prior, lit(1.0) / gap) - 1d)

  /** Piecewise sign-crossing trend (W3, `...990.py:1010-1029`):
    * positive→negative = -0.30; negative worsening = -0.20;
    * negative improving = +0.05; else CAGR. */
  def piecewiseTrend(curr: Column, prior: Column, gap: Column): Column =
    when(curr.isNull || prior.isNull, lit(null))
      .when(prior > 0d && curr <= 0d, -0.30)
      .when(prior <= 0d && curr < prior, -0.20)
      .when(prior <= 0d && curr >= prior, 0.05)
      .otherwise(cagr(curr, prior, gap))
}
