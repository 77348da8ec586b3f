package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Scoring, Tables}

/** Remaining panel/time-series windows from SURVEY.md §2.5: piecewise
  * sign-crossing trend (W3), expense-vs-revenue growth gap (W4), first-year
  * lookup (W5), k-year change with nearest-year fallback via a range frame
  * (W6), and point-difference trend (W7).
  */
object PanelQueries extends QueryGroup {

  private def custPanelSql =
    """SELECT o_custkey AS entity_id, CAST(year(o_orderdate) AS INTEGER) AS year,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) - 190000) AS DOUBLE) AS net_metric
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** Built once per (session, dir): six window queries in this group
    * consume the same customer×year aggregate, so it shares like the
    * dedup pair frames do. */
  private def custPanel(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.cached(s, s"custpanel:$dir") {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("entity_id"),
          year(col("o_orderdate")).as("year"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)") - 190000)
            .cast("double").as("net_metric"))
    }

  private def w = Window.partitionBy("entity_id").orderBy("year")

  /** F18: display formatting — $B/$M/$K money tiers and YoY trend arrows
    * (the reference's client-side JS formatters, master_map2.html:470-476).
    * Rendering goes through DECIMAL, never double→string (double
    * formatting differs across engines; decimal formatting does not). */
  private def displayFormat(s: SparkSession, dir: String): DataFrame = {
    def tier(v: Column, div: Double, suffix: String): Column =
      concat(lit("$"),
        round(v / div, 1).cast("decimal(10,1)").cast("string"), lit(suffix))
    custPanel(s, dir)
      .withColumn("prev", lag(col("revenue"), 1).over(w))
      .select(col("entity_id"), col("year"),
        when(col("revenue") >= 1e9, tier(col("revenue"), 1e9, "B"))
          .when(col("revenue") >= 1e6, tier(col("revenue"), 1e6, "M"))
          .when(col("revenue") >= 1e3, tier(col("revenue"), 1e3, "K"))
          .otherwise(concat(lit("$"),
            round(col("revenue"), 0).cast("decimal(12,0)").cast("string")))
          .as("revenue_disp"),
        when(col("prev").isNull, lit("→"))
          .when(col("revenue") > col("prev"), lit("▲"))
          .when(col("revenue") < col("prev"), lit("▼"))
          .otherwise(lit("→")).as("trend"))
      .orderBy("entity_id", "year")
  }

  /** W3: piecewise sign-crossing trend on a metric that can go negative. */
  private def piecewise(s: SparkSession, dir: String): DataFrame =
    custPanel(s, dir)
      .withColumn("prior_net", lag(col("net_metric"), 1).over(w))
      .withColumn("gap", col("year") - lag(col("year"), 1).over(w))
      .select(col("entity_id"), col("year"), col("net_metric"), col("prior_net"),
        round(Scoring.piecewiseTrend(col("net_metric"), col("prior_net"), col("gap")), 6)
          .as("trend"))
      .orderBy("entity_id", "year")

  /** W4: growth gap — revenue CAGR minus tax-charge CAGR on the
    * supplier×ship-year panel. */
  private def growthGap(s: SparkSession, dir: String): DataFrame = {
    val one = lit(BigDecimal(1)).cast("decimal(18,2)")
    val panel = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("entity_id"),
        year(col("l_shipdate")).as("year"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (one - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_tax").cast("decimal(18,2)"))
          .cast("double").as("tax_charge"))
    panel
      .withColumn("prior_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("prior_tax", lag(col("tax_charge"), 1).over(w))
      .withColumn("gap", col("year") - lag(col("year"), 1).over(w))
      .select(col("entity_id"), col("year"),
        round(Scoring.cagr(col("revenue"), col("prior_revenue"), col("gap")), 6)
          .as("rev_cagr"),
        round(Scoring.cagr(col("tax_charge"), col("prior_tax"), col("gap")), 6)
          .as("tax_cagr"),
        round(Scoring.cagr(col("revenue"), col("prior_revenue"), col("gap")) -
            Scoring.cagr(col("tax_charge"), col("prior_tax"), col("gap")), 6)
          .as("growth_gap"))
      .orderBy("entity_id", "year")
  }

  /** W5: first-year lookup over an unbounded-preceding frame + growth vs
    * the first observation. */
  private def firstYear(s: SparkSession, dir: String): DataFrame = {
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    custPanel(s, dir)
      .withColumn("first_year", first(col("year")).over(frame))
      .withColumn("first_revenue", first(col("revenue")).over(frame))
      .select(col("entity_id"), col("year"), col("revenue"),
        col("first_year"), col("first_revenue"),
        Scoring.safeDiv(col("revenue") - col("first_revenue"), col("first_revenue"))
          .as("growth_vs_first"))
      .orderBy("entity_id", "year")
  }

  /** W6: k-year change with nearest-year-at-or-before fallback — a range
    * frame bounded at 3 preceding years picks the most recent usable base
    * (`..._ipeds_v5.py:883-909`). */
  private def kyearChange(s: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy("entity_id").orderBy("year")
      .rangeBetween(Window.unboundedPreceding, -3)
    custPanel(s, dir)
      .withColumn("base_year", last(col("year")).over(frame))
      .withColumn("base_revenue", last(col("revenue")).over(frame))
      .select(col("entity_id"), col("year"), col("revenue"),
        col("base_year"), col("base_revenue"),
        Scoring.safeDiv(col("revenue") - col("base_revenue"), col("base_revenue"))
          .as("change_vs_base"))
      .orderBy("entity_id", "year")
  }

  /** W7: point-difference trend — (curr - prior)/gap, not CAGR. */
  private def pointDiff(s: SparkSession, dir: String): DataFrame =
    custPanel(s, dir)
      .withColumn("prior_orders", lag(col("n_orders"), 1).over(w))
      .withColumn("gap", col("year") - lag(col("year"), 1).over(w))
      .select(col("entity_id"), col("year"), col("n_orders"), col("prior_orders"),
        when(col("prior_orders").isNull || col("gap").isNull || col("gap") <= 0, lit(null))
          .otherwise((col("n_orders") - col("prior_orders")).cast("double") / col("gap"))
          .as("orders_per_year_delta"))
      .orderBy("entity_id", "year")

  private val pivotYears = 1995 to 2001

  /** Long panel -> per-year flat master columns (`revenue_2024` style,
    * `..._ipeds_v5.py:700-706`): pivot with an explicit year list so the
    * output schema is static. */
  private def pivotWide(s: SparkSession, dir: String): DataFrame =
    custPanel(s, dir)
      .groupBy("entity_id")
      .pivot("year", pivotYears.map(y => y: Any))
      .agg(sum(col("revenue")))
      .select(col("entity_id") +:
        pivotYears.map(y => col(s"$y").as(s"revenue_$y")): _*)
      .orderBy("entity_id")

  /** Wide flat columns -> long panel (the ingest direction for the
    * reference's year-suffixed master columns). */
  private def unpivotLong(s: SparkSession, dir: String): DataFrame =
    pivotWide(s, dir)
      .unpivot(
        Array(col("entity_id")),
        pivotYears.map(y => col(s"revenue_$y")).toArray,
        "year_label", "revenue")
      .withColumn("year",
        regexp_extract(col("year_label"), "([0-9]+)", 1).cast("int"))
      .filter(col("revenue").isNotNull)
      .select("entity_id", "year", "revenue")
      .orderBy("entity_id", "year")

  /** SCD2 validity intervals via gaps-and-islands: classify each
    * customer-year into a revenue tier, then collapse CONSECUTIVE-year
    * runs of the same tier into [from_year, to_year] validity rows — a
    * year gap or a tier change starts a new island (new-island flag =
    * lag compare, island id = running sum of flags). This is how a
    * change log becomes a slowly-changing-dimension history table; one
    * exchange on entity_id serves both windows AND the island rollup.
    * Tier thresholds compare cent-exact DECIMAL-summed revenue, so the
    * classification is engine-identical. */
  private def scd2(s: SparkSession, dir: String): DataFrame = {
    val tier = when(col("revenue") >= 400000d, "high")
      .when(col("revenue") >= 250000d, "mid")
      .otherwise("low")
    custPanel(s, dir)
      .select(col("entity_id"), col("year"), tier.as("tier"))
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .withColumn("prev_year", lag(col("year"), 1).over(w))
      .withColumn("new_island",
        when(col("prev_tier").isNull || col("prev_tier") =!= col("tier") ||
          col("year") =!= col("prev_year") + 1, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("int"))
      .groupBy("entity_id", "island", "tier")
      .agg(min(col("year")).as("from_year"), max(col("year")).as("to_year"),
        count(lit(1)).as("n_years"))
      .orderBy("entity_id", "from_year")
  }

  /** Ranking-window suite over the per-year revenue distribution:
    * percent_rank / cume_dist / ntile(4) / dense_rank in one window.
    * The order key (revenue, entity_id) is UNIQUE — ntile assigns by row
    * position, so a tie-broken total order is what makes the quartile
    * deterministic and engine-identical. Partitioned by year: the window
    * parallelism is the year count x nothing-global, and percent_rank's
    * (rank-1)/(n-1) is exact small-integer division in doubles. */
  private def rankSuite(s: SparkSession, dir: String): DataFrame = {
    val yw = Window.partitionBy("year").orderBy(col("revenue"), col("entity_id"))
    custPanel(s, dir)
      .select(col("entity_id"), col("year"), col("revenue"))
      .withColumn("pr", percent_rank().over(yw))
      .withColumn("cd", cume_dist().over(yw))
      .withColumn("quartile", ntile(4).over(yw))
      .withColumn("rnk", dense_rank().over(yw))
      .orderBy("year", "entity_id")
  }

  /** Rolling 3-year mean + running total per entity. The windowed sums
    * go through DECIMAL(18,2) (cent-exact) and only the final division
    * is double — double accumulation ORDER inside a window frame is the
    * classic cross-engine divergence, and decimal sums make it moot.
    * Same single entity exchange as every panel window. */
  private def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val dec = col("revenue").cast("decimal(18,2)")
    val w3 = w.rowsBetween(-2, 0)
    val wAll = w.rowsBetween(Window.unboundedPreceding, 0)
    custPanel(s, dir)
      .select(col("entity_id"), col("year"), col("revenue"))
      .withColumn("rev_ma3",
        sum(dec).over(w3).cast("double") / count(lit(1)).over(w3))
      .withColumn("rev_cum", sum(dec).over(wAll).cast("double"))
      .orderBy("entity_id", "year")
  }

  /** Exponentially weighted moving average, EXACT: weight for a year at
    * distance d is the integer 3^d * 4^(K-d) (i.e. (3/4)^d up to the
    * common 4^K factor, which cancels in the normalized mean), K = 7
    * covers the panel's year span. Gap-aware by construction — decay
    * follows YEAR distance, not row offset, so missing years still
    * discount. Float EMAs accumulate in frame order (engine-dependent);
    * the integer form is order-independent and oracle-exact.
    *
    * Shape: a bounded self-join on (entity, year within K) rather than a
    * window — the weight depends on the anchor-to-row distance, which no
    * SQL frame aggregate expresses; the join stays on the panel's entity
    * partitioning and fans out at most K+1 rows per anchor. */
  private val EmaSpan = 7
  private val EmaWeights: Seq[Long] =
    (0 to EmaSpan).map(d => math.pow(3, d).toLong * math.pow(4, EmaSpan - d).toLong)
  private def ema(s: SparkSession, dir: String): DataFrame = {
    val p = custPanel(s, dir).select(col("entity_id"), col("year"), col("revenue"))
    val hist = p.select(col("entity_id").as("pe"), col("year").as("py"),
      col("revenue").as("prev"))
    val wv = element_at(typedlit(EmaWeights), col("year") - col("py") + 1)
    p.join(hist, col("entity_id") === col("pe") &&
        col("py").between(col("year") - EmaSpan, col("year")))
      .drop("pe")
      .groupBy("entity_id", "year", "revenue")
      .agg(
        sum((col("prev").cast("decimal(18,2)") * 100).cast("decimal(19,0)") * wv)
          .as("num"),
        sum(wv).as("den"))
      .select(col("entity_id"), col("year"), col("revenue"),
        (col("num").cast("double") / col("den") / lit(100.0)).as("rev_ema"))
      .orderBy("entity_id", "year")
  }

  /** W-family extension: per-entity OLS revenue trend in EXACT integer
    * arithmetic — slope numerator n·Σxy − Σx·Σy and denominator
    * n·Σx² − (Σx)² over (x = year, y = revenue cents) stay in
    * DECIMAL(38,0)/HUGEINT (float Σxy would sum in partition order), one
    * deterministic double division at the end. The reference's trends are
    * all two-point differences (`Hummingbird_Master_engine_990.py:1009`
    * first-vs-last CAGR); the least-squares fit over EVERY year is the
    * robust upgrade a real panel engine offers. Shape: the shared panel
    * aggregate plus one entity-key aggregation. */
  private def olsTrend(s: SparkSession, dir: String): DataFrame = {
    val p = custPanel(s, dir).select(col("entity_id"), col("year"),
      (col("revenue").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    p.groupBy("entity_id")
      .agg(
        count(lit(1)).as("n"),
        sum(col("year").cast("long")).as("sx"),
        sum(col("cents").cast("decimal(38,0)")).as("sy"),
        sum(col("year").cast("decimal(38,0)") * col("cents")).as("sxy"),
        sum(col("year").cast("long") * col("year")).as("sxx"))
      .filter(col("n") >= 2)
      .select(col("entity_id"), col("n").cast("int").as("n_years"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .select(col("entity_id"), col("n_years"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("slope_cents"),
        when(col("num") > 0, "up").when(col("num") < 0, "down")
          .otherwise("flat").as("direction"))
      .orderBy("entity_id")
  }

  /** Panel resample: per-entity dense year grid with carry-forward fill
    * — the gap-filling step every downstream window op silently assumes
    * (the reference's engines special-case year gaps everywhere, e.g.
    * the gap-aware lag `...990.py:983–996`; resampling makes the gaps
    * explicit instead). Level metrics (revenue) carry forward via
    * last(_, ignoreNulls); activity metrics (n_orders) fill with ZERO —
    * a year with no observations had no orders, not "the same orders
    * again". Shape: the span aggregate and the grid join both key on
    * entity, riding the panel's partitioning; `sequence` explode fans
    * out only gap years, bounded by the year span. */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val p = custPanel(s, dir)
    val spans = p.groupBy("entity_id")
      .agg(min("year").as("y0"), max("year").as("y1"))
    val grid = spans.select(col("entity_id"),
      explode(sequence(col("y0"), col("y1"))).as("year"))
    val wFF = Window.partitionBy("entity_id").orderBy("year")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(p, Seq("entity_id", "year"), "left")
      .withColumn("is_filled", col("revenue").isNull)
      .withColumn("revenue_ff", last(col("revenue"), ignoreNulls = true).over(wFF))
      .withColumn("n_orders_ff", when(col("is_filled"), 0L).otherwise(col("n_orders")))
      .select("entity_id", "year", "is_filled", "revenue_ff", "n_orders_ff")
      .orderBy("entity_id", "year")
  }

  override def shared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "cust_panel" -> custPanel,
  )

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot_wide" -> pivotWide,
    "q_unpivot_long" -> unpivotLong,
    "q_piecewise_trend" -> piecewise,
    "q_growth_gap" -> growthGap,
    "q_first_year" -> firstYear,
    "q_kyear_change" -> kyearChange,
    "q_point_diff" -> pointDiff,
    "q_display_format" -> displayFormat,
    "q_scd2" -> scd2,
    "q_rank_suite" -> rankSuite,
    "q_moving_avg" -> movingAvg,
    "q_ema" -> ema,
    "q_ols_trend" -> olsTrend,
    "q_gap_fill" -> gapFill,
  )

  private def pivotCasesSql = pivotYears.map(y =>
    s"MAX(CASE WHEN year = $y THEN revenue END) AS revenue_$y").mkString(",\n  ")

  override def oracle: Map[String, String] = Map(
    // dense year grid via generate_series; carry-forward = last_value
    // IGNORE NULLS over the same frame Spark's last(_, true) uses
    "q_gap_fill" ->
      s"""WITH p AS ($custPanelSql),
         |spans AS (SELECT entity_id, min(year) AS y0, max(year) AS y1
         |          FROM p GROUP BY 1),
         |grid AS (SELECT entity_id,
         |    CAST(unnest(generate_series(y0, y1)) AS INTEGER) AS year FROM spans),
         |j AS (SELECT g.entity_id, g.year, p.revenue, p.n_orders
         |      FROM grid g LEFT JOIN p USING (entity_id, year))
         |SELECT entity_id, year, revenue IS NULL AS is_filled,
         |  last_value(revenue IGNORE NULLS) OVER (PARTITION BY entity_id
         |    ORDER BY year ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS revenue_ff,
         |  coalesce(n_orders, 0) AS n_orders_ff
         |FROM j ORDER BY entity_id, year""".stripMargin,

    // exact-integer OLS: HUGEINT sums mirror Spark's DECIMAL(38,0); the
    // numerator routes through VARCHAR (HUGEINT->DOUBLE direct cast
    // double-rounds; string parsing is correctly rounded, the q_embed_proj
    // pattern) — the denominator is small enough for a direct cast
    "q_ols_trend" ->
      s"""WITH p0 AS ($custPanelSql),
         |p AS (SELECT entity_id, year,
         |        CAST(CAST(revenue AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |      FROM p0),
         |s AS (SELECT entity_id, count(*) AS n, sum(year) AS sx,
         |        sum(CAST(cents AS HUGEINT)) AS sy,
         |        sum(CAST(year AS HUGEINT) * cents) AS sxy,
         |        sum(CAST(year AS BIGINT) * year) AS sxx
         |      FROM p GROUP BY 1 HAVING count(*) >= 2),
         |d AS (SELECT entity_id, CAST(n AS INTEGER) AS n_years,
         |        n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
         |      FROM s)
         |SELECT entity_id, n_years,
         |  round(CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(den AS DOUBLE), 6)
         |    AS slope_cents,
         |  CASE WHEN num > 0 THEN 'up' WHEN num < 0 THEN 'down'
         |       ELSE 'flat' END AS direction
         |FROM d ORDER BY entity_id""".stripMargin,

    // integer EMA weights 3^d * 4^(7-d); BIGINT/HUGEINT sums == Spark
    // DECIMAL sums; the (3/4)^d decay follows year distance (gap-aware)
    "q_ema" ->
      s"""WITH p AS ($custPanelSql),
         |wt(d, wv) AS (VALUES ${EmaWeights.zipWithIndex
           .map { case (w, d) => s"($d, $w)" }.mkString(", ")}),
         |j AS (SELECT a.entity_id, a.year, a.revenue,
         |    CAST(CAST(b.revenue AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |    a.year - b.year AS d
         |  FROM p a JOIN p b ON a.entity_id = b.entity_id
         |    AND b.year BETWEEN a.year - $EmaSpan AND a.year)
         |SELECT entity_id, year, revenue,
         |  CAST(sum(cents * wv) AS DOUBLE) / sum(wv) / 100.0 AS rev_ema
         |FROM j JOIN wt USING (d)
         |GROUP BY entity_id, year, revenue
         |ORDER BY entity_id, year""".stripMargin,
    "q_moving_avg" ->
      s"""WITH p AS ($custPanelSql)
         |SELECT entity_id, year, revenue,
         |  CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
         |    / COUNT(*) OVER w3 AS rev_ma3,
         |  CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER wa AS DOUBLE) AS rev_cum
         |FROM p
         |WINDOW
         |  w3 AS (PARTITION BY entity_id ORDER BY year
         |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         |  wa AS (PARTITION BY entity_id ORDER BY year
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY entity_id, year""".stripMargin,

    "q_rank_suite" ->
      s"""WITH p AS ($custPanelSql)
         |SELECT entity_id, year, revenue,
         |  percent_rank() OVER w AS pr,
         |  cume_dist() OVER w AS cd,
         |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         |  CAST(dense_rank() OVER w AS INTEGER) AS rnk
         |FROM p
         |WINDOW w AS (PARTITION BY year ORDER BY revenue, entity_id)
         |ORDER BY year, entity_id""".stripMargin,

    "q_scd2" ->
      s"""WITH p AS ($custPanelSql),
         |t AS (
         |  SELECT entity_id, year,
         |    CASE WHEN revenue >= 400000 THEN 'high'
         |         WHEN revenue >= 250000 THEN 'mid'
         |         ELSE 'low' END AS tier
         |  FROM p),
         |l AS (
         |  SELECT entity_id, year, tier,
         |    lag(tier) OVER w AS prev_tier, lag(year) OVER w AS prev_year
         |  FROM t WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
         |f AS (
         |  SELECT *, CASE WHEN prev_tier IS NULL OR prev_tier <> tier
         |                   OR year <> prev_year + 1 THEN 1 ELSE 0 END AS ni
         |  FROM l),
         |i AS (
         |  SELECT entity_id, year, tier,
         |    CAST(SUM(ni) OVER (PARTITION BY entity_id ORDER BY year
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS island
         |  FROM f)
         |SELECT entity_id, island, tier,
         |  CAST(min(year) AS INTEGER) AS from_year,
         |  CAST(max(year) AS INTEGER) AS to_year,
         |  COUNT(*) AS n_years
         |FROM i GROUP BY entity_id, island, tier
         |ORDER BY entity_id, from_year""".stripMargin,

    "q_display_format" ->
      s"""WITH panel AS ($custPanelSql),
         |lagged AS (
         |  SELECT entity_id, year, revenue,
         |    lag(revenue) OVER (PARTITION BY entity_id ORDER BY year) AS prev
         |  FROM panel)
         |SELECT entity_id, year,
         |  CASE WHEN revenue >= 1000000000 THEN '$$' || CAST(CAST(round(revenue/1000000000, 1) AS DECIMAL(10,1)) AS VARCHAR) || 'B'
         |       WHEN revenue >= 1000000 THEN '$$' || CAST(CAST(round(revenue/1000000, 1) AS DECIMAL(10,1)) AS VARCHAR) || 'M'
         |       WHEN revenue >= 1000 THEN '$$' || CAST(CAST(round(revenue/1000, 1) AS DECIMAL(10,1)) AS VARCHAR) || 'K'
         |       ELSE '$$' || CAST(CAST(round(revenue, 0) AS DECIMAL(12,0)) AS VARCHAR) END AS revenue_disp,
         |  CASE WHEN prev IS NULL THEN '→'
         |       WHEN revenue > prev THEN '▲'
         |       WHEN revenue < prev THEN '▼'
         |       ELSE '→' END AS trend
         |FROM lagged ORDER BY entity_id, year""".stripMargin,

    "q_pivot_wide" ->
      s"""WITH panel AS ($custPanelSql)
         |SELECT entity_id,
         |  $pivotCasesSql
         |FROM panel GROUP BY entity_id ORDER BY entity_id""".stripMargin,

    "q_unpivot_long" ->
      s"""WITH panel AS ($custPanelSql),
         |wide AS (
         |  SELECT entity_id,
         |    $pivotCasesSql
         |  FROM panel GROUP BY entity_id),
         |long AS (
         |${pivotYears.map(y =>
             s"  SELECT entity_id, $y AS year, revenue_$y AS revenue FROM wide")
             .mkString("\n  UNION ALL\n")})
         |SELECT entity_id, CAST(year AS INTEGER) AS year, revenue FROM long
         |WHERE revenue IS NOT NULL
         |ORDER BY entity_id, year""".stripMargin,

    "q_piecewise_trend" ->
      s"""WITH panel AS ($custPanelSql),
         |lagged AS (
         |  SELECT entity_id, year, net_metric,
         |    lag(net_metric) OVER (PARTITION BY entity_id ORDER BY year) AS prior_net,
         |    year - lag(year) OVER (PARTITION BY entity_id ORDER BY year) AS gap
         |  FROM panel)
         |SELECT entity_id, year, net_metric, prior_net,
         |  round(CASE
         |    WHEN net_metric IS NULL OR prior_net IS NULL THEN NULL
         |    WHEN prior_net > 0 AND net_metric <= 0 THEN -0.30
         |    WHEN prior_net <= 0 AND net_metric < prior_net THEN -0.20
         |    WHEN prior_net <= 0 AND net_metric >= prior_net THEN 0.05
         |    WHEN gap IS NULL OR gap <= 0 OR net_metric <= 0 OR prior_net <= 0 THEN NULL
         |    ELSE pow(net_metric / prior_net, 1.0 / gap) - 1 END, 6) AS trend
         |FROM lagged ORDER BY entity_id, year""".stripMargin,

    "q_growth_gap" ->
      """WITH panel AS (
        |  SELECT l_suppkey AS entity_id, CAST(year(l_shipdate) AS INTEGER) AS year,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax_charge
        |  FROM lineitem GROUP BY 1, 2),
        |lagged AS (
        |  SELECT entity_id, year, revenue, tax_charge,
        |    lag(revenue) OVER w AS prior_revenue,
        |    lag(tax_charge) OVER w AS prior_tax,
        |    year - lag(year) OVER w AS gap
        |  FROM panel WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
        |trends AS (
        |  SELECT entity_id, year,
        |    CASE WHEN revenue IS NULL OR prior_revenue IS NULL OR gap IS NULL
        |           OR gap <= 0 OR revenue <= 0 OR prior_revenue <= 0 THEN NULL
        |         ELSE pow(revenue / prior_revenue, 1.0 / gap) - 1 END AS rc,
        |    CASE WHEN tax_charge IS NULL OR prior_tax IS NULL OR gap IS NULL
        |           OR gap <= 0 OR tax_charge <= 0 OR prior_tax <= 0 THEN NULL
        |         ELSE pow(tax_charge / prior_tax, 1.0 / gap) - 1 END AS tc
        |  FROM lagged)
        |SELECT entity_id, year, round(rc, 6) AS rev_cagr, round(tc, 6) AS tax_cagr,
        |  round(rc - tc, 6) AS growth_gap
        |FROM trends ORDER BY entity_id, year""".stripMargin,

    "q_first_year" ->
      s"""WITH panel AS ($custPanelSql)
         |SELECT entity_id, year, revenue,
         |  first_value(year) OVER w AS first_year,
         |  first_value(revenue) OVER w AS first_revenue,
         |  CASE WHEN first_value(revenue) OVER w IS NULL
         |         OR first_value(revenue) OVER w = 0 THEN NULL
         |       ELSE (revenue - first_value(revenue) OVER w) / first_value(revenue) OVER w
         |  END AS growth_vs_first
         |FROM panel
         |WINDOW w AS (PARTITION BY entity_id ORDER BY year
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY entity_id, year""".stripMargin,

    "q_kyear_change" ->
      s"""WITH panel AS ($custPanelSql)
         |SELECT entity_id, year, revenue,
         |  last_value(year) OVER w AS base_year,
         |  last_value(revenue) OVER w AS base_revenue,
         |  CASE WHEN last_value(revenue) OVER w IS NULL
         |         OR last_value(revenue) OVER w = 0 THEN NULL
         |       ELSE (revenue - last_value(revenue) OVER w) / last_value(revenue) OVER w
         |  END AS change_vs_base
         |FROM panel
         |WINDOW w AS (PARTITION BY entity_id ORDER BY year
         |             RANGE BETWEEN UNBOUNDED PRECEDING AND 3 PRECEDING)
         |ORDER BY entity_id, year""".stripMargin,

    "q_point_diff" ->
      s"""WITH panel AS ($custPanelSql),
         |lagged AS (
         |  SELECT entity_id, year, n_orders,
         |    lag(n_orders) OVER (PARTITION BY entity_id ORDER BY year) AS prior_orders,
         |    year - lag(year) OVER (PARTITION BY entity_id ORDER BY year) AS gap
         |  FROM panel)
         |SELECT entity_id, year, n_orders, prior_orders,
         |  CASE WHEN prior_orders IS NULL OR gap IS NULL OR gap <= 0 THEN NULL
         |       ELSE CAST(n_orders - prior_orders AS DOUBLE) / gap END AS orders_per_year_delta
         |FROM lagged ORDER BY entity_id, year""".stripMargin,
  )
}
