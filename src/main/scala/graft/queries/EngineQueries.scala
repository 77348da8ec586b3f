package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Engine, Scoring, Tables}
import graft.core.Engine.{Domain, Floor, Indicator, ScoringConfig}
import graft.ops.Panel

/** The generic scoring engine ([[graft.core.Engine]]) exercised under the
  * driver's oracle gate: a customer-distress config with two domains, a
  * completeness gate, and a conditional revenue-collapse floor — the same
  * kernel the Form990 model instantiates with 19 indicators.
  */
object EngineQueries extends QueryGroup {

  private def customerConfig: ScoringConfig = ScoringConfig(
    indicators = Seq(
      Indicator("rev_trend", "trend", 0.5, 0.10, -0.30, col("revenue_cagr")),
      Indicator("ord_trend", "trend", 0.5, 0.10, -0.50, col("orders_d_cagr")),
      Indicator("balance", "balance", 1.0, 5000, -500, col("c_acctbal"))),
    domains = Seq(Domain("trend", 0.5), Domain("balance", 0.5)),
    minIndicators = 2,
    floors = Seq(
      Floor("revenue_collapse",
        col("revenue_cagr").isNotNull && col("revenue_cagr") <= -0.5, lit(65d))))

  private def engineScores(s: SparkSession, dir: String): DataFrame = {
    val panel = Panel.sharedCustCagrPanel(s, dir)
    val latest = Panel.latestPerEntity(panel)
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal")),
        col("entity_id") === col("c_custkey"), "inner")
    Engine.score(latest, customerConfig)
      .select(
        col("entity_id"), col("year"),
        round(col("domain_trend"), 4).as("domain_trend"),
        round(col("domain_balance"), 4).as("domain_balance"),
        round(col("composite_score"), 4).as("composite_score"),
        round(col("final_score"), 4).as("final_score"),
        col("n_indicators"),
        col("risk_category"))
      .orderBy("entity_id")
  }

  /** The v5-specific machinery under the oracle gate: a domain multiplier
    * (cliff, F12) capped at 100, and a likely-closed-style null-out of the
    * final score for inactive entities (customers whose last order is
    * 2+ years before the dataset max). */
  private def engineV5(s: SparkSession, dir: String): DataFrame = {
    val panel = Panel.sharedCustCagrPanel(s, dir)
    val latest = Panel.latestPerEntity(panel)
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal")),
        col("entity_id") === col("c_custkey"), "inner")
    val maxy = Tables.orders(s, dir).agg(max(year(col("o_orderdate"))).as("maxy"))
    val withFlags = latest.crossJoin(broadcast(maxy))
      .withColumn("inactive", col("year") <= col("maxy") - 2)
    // cliff: small, shrinking customers get the trend domain amplified
    val mult = lit(1.0) + lit(0.5) *
      when(col("revenue") < 300000d && col("revenue_cagr").isNotNull &&
        col("revenue_cagr") <= -0.10, 1.0).otherwise(0.0)
    val cfg = customerConfig.copy(domainMultipliers = Map("trend" -> mult))
    Engine.score(withFlags, cfg)
      .withColumn("final_score",
        when(col("inactive"), lit(null)).otherwise(col("final_score")))
      .withColumn("risk_category",
        when(col("inactive"), "Inactive")
          .otherwise(Scoring.categorize(col("final_score"))))
      .select(col("entity_id"), col("year"), col("inactive"),
        round(col("domain_trend"), 4).as("domain_trend"),
        round(col("final_score"), 4).as("final_score"),
        col("risk_category"))
      .orderBy("entity_id")
  }

  /** The FULL scoring lifecycle as one composed query, replaying the
    * reference's v5 pipeline shape (`..._ipeds_v5.py:1599-1647`): panel ->
    * usable-year fallback (latest year with >= 2 orders, else latest —
    * the target-else-latest selection) -> fill injection (negative
    * balances treated as missing and filled from the nation-level average,
    * the 990-fill analog) -> likely-closed gate (2+ years inactive) ->
    * score with cliff multiplier and revenue-collapse floor -> integrate
    * into the full customer master -> category distribution. Every stage
    * already has its own oracle row; this row pins the COMPOSITION, so a
    * drift in any stage's interface breaks a hash, not just a unit test.
    * Distribution stats use count/min/max only (exact selections — no
    * float accumulation ordering in the output). */
  private def lifecycleE2E(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 1. panel (session-shared aggregate-then-window subtree)
    val panel = Panel.sharedCustCagrPanel(s, dir)
    // 2. usable-year fallback selection
    val usable = col("n_orders") >= 2
    val sel = Window.partitionBy("entity_id")
      .orderBy(when(usable, 0).otherwise(1).asc, col("year").desc)
    val selected = panel
      .withColumn("was_usable", usable)
      .withColumn("rn", row_number().over(sel))
      .filter(col("rn") === 1).drop("rn")
    // 3. fill injection from a coarser source (broadcast: 25 nations)
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
    val nationFill = cust.filter(col("c_acctbal") >= 0)
      .groupBy("c_nationkey")
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("nation_avg"))
    val filled = selected
      .join(cust, col("entity_id") === col("c_custkey"))
      .join(broadcast(nationFill), Seq("c_nationkey"), "left")
      .withColumn("fill_source",
        when(col("c_acctbal") < 0, "nation").otherwise("master"))
      .withColumn("c_acctbal",
        when(col("c_acctbal") < 0, col("nation_avg")).otherwise(col("c_acctbal")))
    // 4. likely-closed gate flags
    val maxy = Tables.orders(s, dir).agg(max(year(col("o_orderdate"))).as("maxy"))
    val withFlags = filled.crossJoin(broadcast(maxy))
      .withColumn("inactive", col("year") <= col("maxy") - 2)
    // 5. score with the v5 cliff + floor config
    val mult = lit(1.0) + lit(0.5) *
      when(col("revenue") < 300000d && col("revenue_cagr").isNotNull &&
        col("revenue_cagr") <= -0.10, 1.0).otherwise(0.0)
    val cfg = customerConfig.copy(domainMultipliers = Map("trend" -> mult))
    val scored = Engine.score(withFlags, cfg)
      .withColumn("final_score",
        when(col("inactive"), lit(null)).otherwise(col("final_score")))
      .withColumn("risk_category",
        when(col("inactive"), "Inactive")
          .otherwise(Scoring.categorize(col("final_score"))))
      .select("entity_id", "final_score", "risk_category", "was_usable",
        "fill_source")
    // 6. integrate with the master: every customer survives, scored rows
    //    carry their lifecycle columns
    val master = Tables.customer(s, dir).select(col("c_custkey").as("entity_id"))
    val integrated = graft.ops.Merge.integrate(master, scored, "entity_id",
      Seq("final_score", "risk_category", "was_usable", "fill_source"))
    // 7. category distribution (the reference's printed value_counts step)
    integrated
      .withColumn("risk_category", coalesce(col("risk_category"), lit("NoData")))
      .groupBy("risk_category")
      .agg(
        count(lit(1)).as("n_entities"),
        count(when(col("fill_source") === "nation", 1)).as("n_filled"),
        count(when(!col("was_usable"), 1)).as("n_fallback"),
        round(min(col("final_score")), 4).as("min_score"),
        round(max(col("final_score")), 4).as("max_score"))
      .orderBy("risk_category")
  }

  /** The 990 (v1) lifecycle as one composed query, replaying the
    * reference's run block (`...990.py:1456-1512`): seed scan (master's
    * data_source filter -> target key set, the EIN list), filings loaded
    * at three richness levels and FILTERED TO SEEDS AT LOAD (`filter_eins`),
    * richer-form upgrade per (entity, year) with STD > EZ > PF rank
    * (`...990.py:713-715`), gap-aware trends over the upgraded panel,
    * year-by-year scoring (the `score_all_years` detail export), then
    * latest-year integration into the seed master (`integrate_with_master`
    * at target_year — every seed survives, unmatched ones as NoData). The
    * IPEDS v5 composition is pinned by `q_lifecycle_e2e`; this row pins
    * the 990 path's distinct stages: seed semi-join, form upgrade, and
    * all-years detail.
    *
    * Form richness mapping on the orders panel: STD exists when
    * n_orders >= 3 and carries BOTH revenue and order-count series; EZ
    * (2..5 orders) and PF (always) carry revenue only — so the upgrade
    * changes which indicators exist per year, exercising the null-renorm
    * weight machinery exactly the way the three real filing types do. */
  private def lifecycle990(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 1. seed scan: the master's data_source filter
    val master = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val seeds = master.filter(col("c_mktsegment") === "BUILDING")
    // 2. filings at three richness levels, seed-filtered at load
    val panel0 = Tables.orders(s, dir)
      .join(seeds.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_semi")
      .groupBy(col("o_custkey").as("entity_id"),
        year(col("o_orderdate")).as("year"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
    val std = panel0.filter(col("n_orders") >= 3)
      .select(col("entity_id"), col("year"), col("revenue"),
        col("n_orders").cast("double").as("orders_d"), lit("STD").as("filing_type"))
    val ez = panel0.filter(col("n_orders").between(2, 5))
      .select(col("entity_id"), col("year"), col("revenue"),
        lit(null).cast("double").as("orders_d"), lit("EZ").as("filing_type"))
    val pf = panel0
      .select(col("entity_id"), col("year"), col("revenue"),
        lit(null).cast("double").as("orders_d"), lit("PF").as("filing_type"))
    // 3. richer-form upgrade: STD > EZ > PF per (entity, year)
    val rank = when(col("filing_type") === "STD", 0)
      .when(col("filing_type") === "EZ", 1).otherwise(2)
    val panel = graft.ingest.Ingest.dedupRicherForm(
      std.unionByName(ez).unionByName(pf), "entity_id", "year", rank, col("year"))
    // 4. gap-aware trends over the upgraded panel
    val w = Window.partitionBy("entity_id").orderBy("year")
    val trended = panel
      .withColumn("prior_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("prior_orders", lag(col("orders_d"), 1).over(w))
      .withColumn("gap", col("year") - lag(col("year"), 1).over(w))
      .withColumn("revenue_cagr",
        Scoring.cagr(col("revenue"), col("prior_revenue"), col("gap")))
      .withColumn("orders_d_cagr",
        Scoring.cagr(col("orders_d"), col("prior_orders"), col("gap")))
    // 5. score EVERY panel year (the reference's detail export)
    val detail = Engine.score(
      trended.join(master.select(col("c_custkey"), col("c_acctbal")),
        col("entity_id") === col("c_custkey")),
      customerConfig)
    // 6. latest-year integration into the seed master
    val latest = detail
      .withColumn("rn", row_number().over(
        Window.partitionBy("entity_id").orderBy(col("year").desc)))
      .filter(col("rn") === 1)
    val perEntity = detail.groupBy("entity_id").agg(count(lit(1)).as("n_years"))
      .join(latest.select(col("entity_id"), col("year"), col("filing_type"),
        round(col("final_score"), 4).as("final_score"), col("risk_category")),
        Seq("entity_id"))
    graft.ops.Merge.integrate(
        seeds.select(col("c_custkey").as("entity_id")), perEntity, "entity_id",
        Seq("n_years", "year", "filing_type", "final_score", "risk_category"))
      .withColumn("risk_category", coalesce(col("risk_category"), lit("NoData")))
      .orderBy("entity_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_engine_scores" -> engineScores,
    "q_engine_v5" -> engineV5,
    "q_lifecycle_e2e" -> lifecycleE2E,
    "q_lifecycle_990" -> lifecycle990,
  )

  override def oracle: Map[String, String] = Map(
    // the 990 composition: seed scan -> seed-filtered form load ->
    // richer-form upgrade (STD > EZ > PF) -> gap-aware trends ->
    // year-by-year scores -> latest-year integrate into the seed master
    "q_lifecycle_990" ->
      """WITH seeds AS (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |panel0 AS (
        |  SELECT o_custkey AS entity_id, CAST(year(o_orderdate) AS INTEGER) AS year,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders JOIN seeds ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |forms AS (
        |  SELECT entity_id, year, revenue, CAST(n_orders AS DOUBLE) AS orders_d,
        |    'STD' AS filing_type, 0 AS frank FROM panel0 WHERE n_orders >= 3
        |  UNION ALL
        |  SELECT entity_id, year, revenue, NULL, 'EZ', 1
        |  FROM panel0 WHERE n_orders BETWEEN 2 AND 5
        |  UNION ALL
        |  SELECT entity_id, year, revenue, NULL, 'PF', 2 FROM panel0),
        |upgraded AS (
        |  SELECT entity_id, year, revenue, orders_d, filing_type FROM forms
        |  QUALIFY row_number() OVER (PARTITION BY entity_id, year
        |    ORDER BY frank ASC) = 1),
        |lagged AS (
        |  SELECT entity_id, year, revenue, orders_d, filing_type,
        |    lag(revenue) OVER w AS prior_revenue,
        |    lag(orders_d) OVER w AS prior_orders,
        |    year - lag(year) OVER w AS gap
        |  FROM upgraded WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
        |trended AS (
        |  SELECT entity_id, year, filing_type,
        |    CASE WHEN revenue IS NULL OR prior_revenue IS NULL OR gap IS NULL
        |           OR gap <= 0 OR revenue <= 0 OR prior_revenue <= 0 THEN NULL
        |         ELSE pow(revenue / prior_revenue, 1.0 / gap) - 1 END AS rev_cagr,
        |    CASE WHEN orders_d IS NULL OR prior_orders IS NULL OR gap IS NULL
        |           OR gap <= 0 OR orders_d <= 0 OR prior_orders <= 0 THEN NULL
        |         ELSE pow(orders_d / prior_orders, 1.0 / gap) - 1 END AS ord_cagr
        |  FROM lagged),
        |inds AS (
        |  SELECT t.entity_id, t.year, t.filing_type, rev_cagr,
        |    CASE WHEN rev_cagr IS NULL THEN NULL
        |         WHEN rev_cagr >= 0.10 THEN 0.0
        |         WHEN rev_cagr <= -0.30 THEN 1.0
        |         ELSE (0.10 - rev_cagr) / 0.40 END AS i_rev,
        |    CASE WHEN ord_cagr IS NULL THEN NULL
        |         WHEN ord_cagr >= 0.10 THEN 0.0
        |         WHEN ord_cagr <= -0.50 THEN 1.0
        |         ELSE (0.10 - ord_cagr) / 0.60 END AS i_ord,
        |    CASE WHEN s.c_acctbal IS NULL THEN NULL
        |         WHEN s.c_acctbal >= 5000 THEN 0.0
        |         WHEN s.c_acctbal <= -500 THEN 1.0
        |         ELSE (5000 - s.c_acctbal) / 5500 END AS i_bal
        |  FROM trended t JOIN seeds s ON t.entity_id = s.c_custkey),
        |doms AS (
        |  SELECT entity_id, year, filing_type, rev_cagr, i_rev, i_ord, i_bal,
        |    CASE WHEN (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN i_rev IS NOT NULL THEN i_rev * 0.5 ELSE 0 END
        |          + CASE WHEN i_ord IS NOT NULL THEN i_ord * 0.5 ELSE 0 END)
        |         / (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) * 100
        |      ELSE NULL END AS dom_trend,
        |    CASE WHEN i_bal IS NOT NULL THEN i_bal * 1.0 / 1.0 * 100 ELSE NULL END AS dom_balance
        |  FROM inds),
        |comp AS (
        |  SELECT entity_id, year, filing_type, rev_cagr,
        |    (CASE WHEN i_rev IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_ord IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_bal IS NOT NULL THEN 1 ELSE 0 END) AS n_indicators,
        |    CASE WHEN (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN dom_trend IS NOT NULL THEN dom_trend * 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN dom_balance * 0.5 ELSE 0 END)
        |         / (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) * 1.0
        |      ELSE NULL END AS raw_composite
        |  FROM doms),
        |scored AS (
        |  SELECT entity_id, year, filing_type,
        |    CASE WHEN rev_cagr IS NOT NULL AND rev_cagr <= -0.5
        |          AND composite IS NOT NULL
        |         THEN greatest(composite, 65.0) ELSE composite END AS final
        |  FROM (SELECT *,
        |    CASE WHEN n_indicators >= 2 THEN raw_composite ELSE NULL END AS composite
        |    FROM comp)),
        |latest AS (
        |  SELECT entity_id, year, filing_type, final,
        |    CASE WHEN final IS NULL THEN 'Unknown'
        |         WHEN final < 20 THEN 'Healthy'
        |         WHEN final < 40 THEN 'Watch'
        |         WHEN final < 60 THEN 'Elevated'
        |         WHEN final < 80 THEN 'High'
        |         ELSE 'Severe' END AS risk_category
        |  FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY entity_id ORDER BY year DESC) = 1),
        |yrs AS (SELECT entity_id, COUNT(*) AS n_years FROM scored GROUP BY 1)
        |SELECT s.c_custkey AS entity_id, y.n_years, l.year, l.filing_type,
        |  round(l.final, 4) AS final_score,
        |  COALESCE(l.risk_category, 'NoData') AS risk_category
        |FROM seeds s
        |LEFT JOIN latest l ON s.c_custkey = l.entity_id
        |LEFT JOIN yrs y ON s.c_custkey = y.entity_id
        |ORDER BY entity_id""".stripMargin,

    // the full lifecycle composition: panel -> usable-year fallback ->
    // nation-average fill -> inactive gate -> cliff+floor scoring ->
    // master integrate -> category distribution
    "q_lifecycle_e2e" ->
      """WITH panel AS (
        |  SELECT o_custkey AS entity_id, CAST(year(o_orderdate) AS INTEGER) AS year,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT CAST(max(year(o_orderdate)) AS INTEGER) AS maxy FROM orders),
        |lagged AS (
        |  SELECT entity_id, year, revenue, n_orders,
        |    CAST(n_orders AS DOUBLE) AS orders_d,
        |    lag(revenue) OVER w AS prior_revenue,
        |    lag(CAST(n_orders AS DOUBLE)) OVER w AS prior_orders,
        |    year - lag(year) OVER w AS gap
        |  FROM panel WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
        |selected AS (
        |  SELECT *, (n_orders >= 2) AS was_usable
        |  FROM lagged
        |  QUALIFY row_number() OVER (PARTITION BY entity_id
        |    ORDER BY CASE WHEN n_orders >= 2 THEN 0 ELSE 1 END ASC, year DESC) = 1),
        |trended AS (
        |  SELECT entity_id, year, revenue, was_usable,
        |    CASE WHEN revenue IS NULL OR prior_revenue IS NULL OR gap IS NULL
        |           OR gap <= 0 OR revenue <= 0 OR prior_revenue <= 0 THEN NULL
        |         ELSE pow(revenue / prior_revenue, 1.0 / gap) - 1 END AS rev_cagr,
        |    CASE WHEN orders_d IS NULL OR prior_orders IS NULL OR gap IS NULL
        |           OR gap <= 0 OR orders_d <= 0 OR prior_orders <= 0 THEN NULL
        |         ELSE pow(orders_d / prior_orders, 1.0 / gap) - 1 END AS ord_cagr
        |  FROM selected),
        |nation_fill AS (
        |  SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS nation_avg
        |  FROM customer WHERE c_acctbal >= 0 GROUP BY 1),
        |filled AS (
        |  SELECT t.*, b.maxy,
        |    CASE WHEN c.c_acctbal < 0 THEN 'nation' ELSE 'master' END AS fill_source,
        |    CASE WHEN c.c_acctbal < 0 THEN nf.nation_avg ELSE c.c_acctbal END AS bal
        |  FROM trended t
        |  JOIN customer c ON t.entity_id = c.c_custkey
        |  LEFT JOIN nation_fill nf ON c.c_nationkey = nf.c_nationkey
        |  CROSS JOIN bounds b),
        |inds AS (
        |  SELECT entity_id, year, revenue, was_usable, fill_source, rev_cagr,
        |    (year <= maxy - 2) AS inactive,
        |    CASE WHEN rev_cagr IS NULL THEN NULL
        |         WHEN rev_cagr >= 0.10 THEN 0.0
        |         WHEN rev_cagr <= -0.30 THEN 1.0
        |         ELSE (0.10 - rev_cagr) / 0.40 END AS i_rev,
        |    CASE WHEN ord_cagr IS NULL THEN NULL
        |         WHEN ord_cagr >= 0.10 THEN 0.0
        |         WHEN ord_cagr <= -0.50 THEN 1.0
        |         ELSE (0.10 - ord_cagr) / 0.60 END AS i_ord,
        |    CASE WHEN bal IS NULL THEN NULL
        |         WHEN bal >= 5000 THEN 0.0
        |         WHEN bal <= -500 THEN 1.0
        |         ELSE (5000 - bal) / 5500 END AS i_bal
        |  FROM filled),
        |doms AS (
        |  SELECT entity_id, was_usable, fill_source, inactive, rev_cagr,
        |    i_rev, i_ord, i_bal,
        |    CASE WHEN (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN least(100.0,
        |        (CASE WHEN i_rev IS NOT NULL THEN i_rev * 0.5 ELSE 0 END
        |       + CASE WHEN i_ord IS NOT NULL THEN i_ord * 0.5 ELSE 0 END)
        |        / (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |         + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) * 100
        |        * CASE WHEN revenue < 300000 AND rev_cagr IS NOT NULL
        |                AND rev_cagr <= -0.10 THEN 1.5 ELSE 1.0 END)
        |      ELSE NULL END AS dom_trend,
        |    CASE WHEN i_bal IS NOT NULL THEN i_bal * 1.0 / 1.0 * 100 ELSE NULL END AS dom_balance
        |  FROM inds),
        |comp AS (
        |  SELECT entity_id, was_usable, fill_source, inactive, rev_cagr, dom_trend,
        |    (CASE WHEN i_rev IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_ord IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_bal IS NOT NULL THEN 1 ELSE 0 END) AS n_indicators,
        |    CASE WHEN (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN dom_trend IS NOT NULL THEN dom_trend * 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN dom_balance * 0.5 ELSE 0 END)
        |         / (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) * 1.0
        |      ELSE NULL END AS raw_composite
        |  FROM doms),
        |floored AS (
        |  SELECT entity_id, was_usable, fill_source, inactive,
        |    CASE WHEN rev_cagr IS NOT NULL AND rev_cagr <= -0.5
        |          AND composite IS NOT NULL
        |         THEN greatest(composite, 65.0) ELSE composite END AS final
        |  FROM (SELECT *,
        |    CASE WHEN n_indicators >= 2 THEN raw_composite ELSE NULL END AS composite
        |    FROM comp)),
        |scored AS (
        |  SELECT entity_id, was_usable, fill_source,
        |    CASE WHEN inactive THEN NULL ELSE final END AS final_score,
        |    CASE WHEN inactive THEN 'Inactive'
        |         WHEN final IS NULL THEN 'Unknown'
        |         WHEN final < 20 THEN 'Healthy'
        |         WHEN final < 40 THEN 'Watch'
        |         WHEN final < 60 THEN 'Elevated'
        |         WHEN final < 80 THEN 'High'
        |         ELSE 'Severe' END AS risk_category
        |  FROM floored),
        |integrated AS (
        |  SELECT c.c_custkey AS entity_id, s.final_score, s.risk_category,
        |    s.was_usable, s.fill_source
        |  FROM customer c LEFT JOIN scored s ON c.c_custkey = s.entity_id)
        |SELECT COALESCE(risk_category, 'NoData') AS risk_category,
        |  COUNT(*) AS n_entities,
        |  COUNT(CASE WHEN fill_source = 'nation' THEN 1 END) AS n_filled,
        |  COUNT(CASE WHEN NOT was_usable THEN 1 END) AS n_fallback,
        |  round(min(final_score), 4) AS min_score,
        |  round(max(final_score), 4) AS max_score
        |FROM integrated GROUP BY 1 ORDER BY risk_category""".stripMargin,

    "q_engine_v5" ->
      """WITH panel AS (
        |  SELECT o_custkey AS entity_id, CAST(year(o_orderdate) AS INTEGER) AS year,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT CAST(max(year(o_orderdate)) AS INTEGER) AS maxy FROM orders),
        |lagged AS (
        |  SELECT entity_id, year, revenue,
        |    CAST(n_orders AS DOUBLE) AS orders_d,
        |    lag(revenue) OVER w AS prior_revenue,
        |    lag(CAST(n_orders AS DOUBLE)) OVER w AS prior_orders,
        |    year - lag(year) OVER w AS gap,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY year DESC) AS rn
        |  FROM panel WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
        |trended AS (
        |  SELECT entity_id, year, revenue,
        |    CASE WHEN revenue IS NULL OR prior_revenue IS NULL OR gap IS NULL
        |           OR gap <= 0 OR revenue <= 0 OR prior_revenue <= 0 THEN NULL
        |         ELSE pow(revenue / prior_revenue, 1.0 / gap) - 1 END AS rev_cagr,
        |    CASE WHEN orders_d IS NULL OR prior_orders IS NULL OR gap IS NULL
        |           OR gap <= 0 OR orders_d <= 0 OR prior_orders <= 0 THEN NULL
        |         ELSE pow(orders_d / prior_orders, 1.0 / gap) - 1 END AS ord_cagr
        |  FROM lagged WHERE rn = 1),
        |inds AS (
        |  SELECT t.entity_id, t.year, t.revenue, rev_cagr,
        |    (t.year <= b.maxy - 2) AS inactive,
        |    CASE WHEN rev_cagr IS NULL THEN NULL
        |         WHEN rev_cagr >= 0.10 THEN 0.0
        |         WHEN rev_cagr <= -0.30 THEN 1.0
        |         ELSE (0.10 - rev_cagr) / 0.40 END AS i_rev,
        |    CASE WHEN ord_cagr IS NULL THEN NULL
        |         WHEN ord_cagr >= 0.10 THEN 0.0
        |         WHEN ord_cagr <= -0.50 THEN 1.0
        |         ELSE (0.10 - ord_cagr) / 0.60 END AS i_ord,
        |    CASE WHEN c.c_acctbal IS NULL THEN NULL
        |         WHEN c.c_acctbal >= 5000 THEN 0.0
        |         WHEN c.c_acctbal <= -500 THEN 1.0
        |         ELSE (5000 - c.c_acctbal) / 5500 END AS i_bal
        |  FROM trended t JOIN customer c ON t.entity_id = c.c_custkey
        |  CROSS JOIN bounds b),
        |doms AS (
        |  SELECT entity_id, year, inactive, rev_cagr, i_rev, i_ord, i_bal,
        |    CASE WHEN (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN least(100.0,
        |        (CASE WHEN i_rev IS NOT NULL THEN i_rev * 0.5 ELSE 0 END
        |       + CASE WHEN i_ord IS NOT NULL THEN i_ord * 0.5 ELSE 0 END)
        |        / (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |         + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) * 100
        |        * CASE WHEN revenue < 300000 AND rev_cagr IS NOT NULL
        |                AND rev_cagr <= -0.10 THEN 1.5 ELSE 1.0 END)
        |      ELSE NULL END AS dom_trend,
        |    CASE WHEN i_bal IS NOT NULL THEN i_bal * 1.0 / 1.0 * 100 ELSE NULL END AS dom_balance
        |  FROM inds),
        |comp AS (
        |  SELECT entity_id, year, inactive, rev_cagr, dom_trend, dom_balance,
        |    (CASE WHEN i_rev IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_ord IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_bal IS NOT NULL THEN 1 ELSE 0 END) AS n_indicators,
        |    CASE WHEN (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN dom_trend IS NOT NULL THEN dom_trend * 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN dom_balance * 0.5 ELSE 0 END)
        |         / (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) * 1.0
        |      ELSE NULL END AS raw_composite
        |  FROM doms),
        |gated AS (
        |  SELECT entity_id, year, inactive, rev_cagr, dom_trend,
        |    CASE WHEN n_indicators >= 2 THEN raw_composite ELSE NULL END AS composite
        |  FROM comp),
        |floored AS (
        |  SELECT entity_id, year, inactive, dom_trend,
        |    CASE WHEN rev_cagr IS NOT NULL AND rev_cagr <= -0.5 AND composite IS NOT NULL
        |         THEN greatest(composite, 65.0) ELSE composite END AS final
        |  FROM gated),
        |final AS (
        |  SELECT entity_id, year, inactive, dom_trend,
        |    CASE WHEN inactive THEN NULL ELSE final END AS final_score
        |  FROM floored)
        |SELECT entity_id, year, inactive,
        |  round(dom_trend, 4) AS domain_trend,
        |  round(final_score, 4) AS final_score,
        |  CASE WHEN inactive THEN 'Inactive'
        |       WHEN final_score IS NULL THEN 'Unknown'
        |       WHEN final_score < 20 THEN 'Healthy'
        |       WHEN final_score < 40 THEN 'Watch'
        |       WHEN final_score < 60 THEN 'Elevated'
        |       WHEN final_score < 80 THEN 'High'
        |       ELSE 'Severe' END AS risk_category
        |FROM final ORDER BY entity_id""".stripMargin,

    "q_engine_scores" ->
      """WITH panel AS (
        |  SELECT o_custkey AS entity_id, CAST(year(o_orderdate) AS INTEGER) AS year,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |lagged AS (
        |  SELECT entity_id, year, revenue,
        |    CAST(n_orders AS DOUBLE) AS orders_d,
        |    lag(revenue) OVER w AS prior_revenue,
        |    lag(CAST(n_orders AS DOUBLE)) OVER w AS prior_orders,
        |    year - lag(year) OVER w AS gap,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY year DESC) AS rn
        |  FROM panel WINDOW w AS (PARTITION BY entity_id ORDER BY year)),
        |trended AS (
        |  SELECT entity_id, year,
        |    CASE WHEN revenue IS NULL OR prior_revenue IS NULL OR gap IS NULL
        |           OR gap <= 0 OR revenue <= 0 OR prior_revenue <= 0 THEN NULL
        |         ELSE pow(revenue / prior_revenue, 1.0 / gap) - 1 END AS rev_cagr,
        |    CASE WHEN orders_d IS NULL OR prior_orders IS NULL OR gap IS NULL
        |           OR gap <= 0 OR orders_d <= 0 OR prior_orders <= 0 THEN NULL
        |         ELSE pow(orders_d / prior_orders, 1.0 / gap) - 1 END AS ord_cagr
        |  FROM lagged WHERE rn = 1),
        |inds AS (
        |  SELECT t.entity_id, t.year, rev_cagr,
        |    CASE WHEN rev_cagr IS NULL THEN NULL
        |         WHEN rev_cagr >= 0.10 THEN 0.0
        |         WHEN rev_cagr <= -0.30 THEN 1.0
        |         ELSE (0.10 - rev_cagr) / 0.40 END AS i_rev,
        |    CASE WHEN ord_cagr IS NULL THEN NULL
        |         WHEN ord_cagr >= 0.10 THEN 0.0
        |         WHEN ord_cagr <= -0.50 THEN 1.0
        |         ELSE (0.10 - ord_cagr) / 0.60 END AS i_ord,
        |    CASE WHEN c.c_acctbal IS NULL THEN NULL
        |         WHEN c.c_acctbal >= 5000 THEN 0.0
        |         WHEN c.c_acctbal <= -500 THEN 1.0
        |         ELSE (5000 - c.c_acctbal) / 5500 END AS i_bal
        |  FROM trended t JOIN customer c ON t.entity_id = c.c_custkey),
        |doms AS (
        |  SELECT entity_id, year, rev_cagr, i_rev, i_ord, i_bal,
        |    CASE WHEN (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN i_rev IS NOT NULL THEN i_rev * 0.5 ELSE 0 END
        |          + CASE WHEN i_ord IS NOT NULL THEN i_ord * 0.5 ELSE 0 END)
        |         / (CASE WHEN i_rev IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN i_ord IS NOT NULL THEN 0.5 ELSE 0 END) * 100
        |      ELSE NULL END AS dom_trend,
        |    CASE WHEN i_bal IS NOT NULL THEN i_bal * 1.0 / 1.0 * 100 ELSE NULL END AS dom_balance
        |  FROM inds),
        |comp AS (
        |  SELECT entity_id, year, rev_cagr, dom_trend, dom_balance,
        |    (CASE WHEN i_rev IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_ord IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN i_bal IS NOT NULL THEN 1 ELSE 0 END) AS n_indicators,
        |    CASE WHEN (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |             + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) > 0
        |      THEN (CASE WHEN dom_trend IS NOT NULL THEN dom_trend * 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN dom_balance * 0.5 ELSE 0 END)
        |         / (CASE WHEN dom_trend IS NOT NULL THEN 0.5 ELSE 0 END
        |          + CASE WHEN dom_balance IS NOT NULL THEN 0.5 ELSE 0 END) * 1.0
        |      ELSE NULL END AS raw_composite
        |  FROM doms),
        |gated AS (
        |  SELECT entity_id, year, dom_trend, dom_balance, n_indicators,
        |    CASE WHEN n_indicators >= 2 THEN raw_composite ELSE NULL END AS composite,
        |    rev_cagr
        |  FROM comp),
        |floored AS (
        |  SELECT entity_id, year, dom_trend, dom_balance, n_indicators, composite,
        |    CASE WHEN rev_cagr IS NOT NULL AND rev_cagr <= -0.5 AND composite IS NOT NULL
        |         THEN greatest(composite, 65.0) ELSE composite END AS final
        |  FROM gated)
        |SELECT entity_id, year,
        |  round(dom_trend, 4) AS domain_trend,
        |  round(dom_balance, 4) AS domain_balance,
        |  round(composite, 4) AS composite_score,
        |  round(final, 4) AS final_score,
        |  n_indicators,
        |  CASE WHEN final IS NULL THEN 'Unknown'
        |       WHEN final < 20 THEN 'Healthy'
        |       WHEN final < 40 THEN 'Watch'
        |       WHEN final < 60 THEN 'Elevated'
        |       WHEN final < 80 THEN 'High'
        |       ELSE 'Severe' END AS risk_category
        |FROM floored ORDER BY entity_id""".stripMargin,
  )
}
