package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The generic scoring engine: the reference's two 1,500-line Python
  * engines (`Hummingbird_Master_engine_990.py`, `..._ipeds_v5.py`) differ
  * only in their *data* — indicator definitions, weights, thresholds,
  * domains, floors — so here the engine is one kernel driven by a
  * declarative [[ScoringConfig]] (SURVEY.md §7.1: "weights/thresholds are
  * data, not code").
  *
  * Pipeline per row (entity×year):
  *   raw metric exprs -> interpolated indicator scores (F6)
  *   -> per-domain weighted null-renormalizing mean ×100 (A1)
  *   -> optional domain multipliers, capped at 100 (F12 cliff)
  *   -> composite = renormalizing mean over domain scores (A2)
  *   -> MIN_INDICATORS completeness gate (A3)
  *   -> conditional floors, final = max(floor, score) (F13)
  *   -> risk category bins (F7)
  *
  * Everything is a horizontal Column fold — no UDFs, no shuffles beyond
  * whatever built the input panel; the whole scoring stage is one
  * whole-stage-codegen projection, which is what makes it viable at
  * 100 TB (scoring cost is a map over the panel, embarrassingly parallel).
  */
object Engine {

  /** One continuous indicator: `raw` is interpolated between thresholds
    * (direction inferred from ordering; see [[Scoring.interpolate]]).
    * Boolean flags score via interpolate(flag, healthy=0, distress=1). */
  case class Indicator(name: String, domain: String, weight: Double,
                       healthy: Double, distress: Double, raw: Column)

  case class Domain(name: String, weight: Double)

  /** Conditional score floor: when `guard`, final >= `floor`. */
  case class Floor(name: String, guard: Column, floor: Column)

  case class ScoringConfig(
      indicators: Seq[Indicator],
      domains: Seq[Domain],
      minIndicators: Int,
      floors: Seq[Floor] = Nil,
      domainMultipliers: Map[String, Column] = Map.empty)

  def indCol(name: String): String = s"ind_$name"
  def domCol(name: String): String = s"domain_$name"

  /** Score a panel DataFrame. Adds ind_*, domain_*, composite_score,
    * n_indicators, final_score, risk_category. */
  def score(panel: DataFrame, cfg: ScoringConfig): DataFrame = {
    require(cfg.indicators.nonEmpty && cfg.domains.nonEmpty)
    val knownDomains = cfg.domains.map(_.name).toSet
    require(cfg.indicators.forall(i => knownDomains(i.domain)),
      "indicator references unknown domain")

    // 1. indicator scores
    val withInds = cfg.indicators.foldLeft(panel) { (df, i) =>
      df.withColumn(indCol(i.name), Scoring.interpolate(i.raw, i.healthy, i.distress))
    }

    // 2. domain scores (0-100), with optional capped multiplier
    val withDomains = cfg.domains.foldLeft(withInds) { (df, d) =>
      val members = cfg.indicators.filter(_.domain == d.name)
      val base = Scoring.weightedRenormMean(
        members.map(i => col(indCol(i.name)) -> i.weight))
      val boosted = cfg.domainMultipliers.get(d.name) match {
        // guard before least(): it skips NULLs, which would turn an
        // unscoreable domain into a hard 100
        case Some(mult) =>
          when(base.isNull, lit(null)).otherwise(least(lit(100.0), base * mult))
        case None => base
      }
      df.withColumn(domCol(d.name), boosted)
    }

    // 3. composite over domain scores (already 0-100 -> scale 1)
    val composite = Scoring.weightedRenormMean(
      cfg.domains.map(d => col(domCol(d.name)) -> d.weight), scale = 1.0)

    // 4. completeness gate
    val indCols = cfg.indicators.map(i => col(indCol(i.name)))
    val gated = Scoring.minIndicatorsGate(composite, indCols, cfg.minIndicators)

    val withComposite = withDomains
      .withColumn("composite_score", gated)
      .withColumn("n_indicators", Scoring.nonNullCount(indCols))

    // 5. floors (never lower a score), then categorize
    val floored = cfg.floors.foldLeft(col("composite_score")) { (acc, f) =>
      Scoring.applyFloor(acc, f.guard, f.floor)
    }
    withComposite
      .withColumn("final_score", floored)
      .withColumn("risk_category", Scoring.categorize(col("final_score")))
  }
}
