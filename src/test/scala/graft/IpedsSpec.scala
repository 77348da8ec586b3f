package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.ingest.Ingest
import graft.model.Ipeds

/** IPEDS v5 engine fixtures: wide year-prefixed headers through the
  * substring resolver, accounting-standard detection, subsidiary
  * contamination, 990 injection, likely-closed gating, cliff multiplier,
  * and floors. */
class IpedsSpec extends SparkSuite with org.scalactic.Tolerance {

  private lazy val dir = Files.createTempDirectory("graftipeds").toFile.getAbsolutePath

  private def writeYear(name: String, yearTag: String, rows: Seq[String]): String = {
    val header = Seq(
      "unitid",
      s"institution name (HD$yearTag)",
      "Employer Identification Number",
      s"DRVEF$yearTag.Total  enrollment",
      s"DRVEF$yearTag.Full-time enrollment",
      s"EF${yearTag}D.Full-time retention rate",
      s"DRVGR$yearTag.Graduation rate, total cohort",
      s"DRVADM$yearTag.Percent admitted - total",
      s"DRVEF$yearTag.Student-to-faculty ratio",
      s"F${yearTag}_F2.Total assets",
      s"F${yearTag}_F2.Total liabilities",
      s"F${yearTag}_F2.Total net assets",
      s"F${yearTag}_F2.Total revenues and investment return",
      s"F${yearTag}_F2.Total expenses",
      s"F${yearTag}_F1A.Total assets",
      s"F${yearTag}_F1A.Net position",
      s"F${yearTag}_F1A.Total all revenues",
      s"F${yearTag}_F1A.Total expenses",
      s"F${yearTag}_F3.Total assets",
      s"F${yearTag}_F3.Total equity",
      s"F${yearTag}_F3.Total revenues and investment return",
      s"F${yearTag}_F3.Total expenses")
      // IPEDS labels contain commas ("Graduation rate, total cohort") —
      // they must be quoted or the header has more fields than the rows
      .map(h => if (h.contains(",")) "\"" + h + "\"" else h)
      .mkString(",")
    val p = s"$dir/$name"
    Files.writeString(java.nio.file.Paths.get(p), (header +: rows).mkString("\n"))
    p
  }

  /** Build a 22-field row positionally (hand-counting commas in wide CSV
    * fixtures is how the first version of this spec broke). */
  private def r(unitid: String, name: String, ein: String,
                enroll: String = "", ft: String = "", ret: String = "",
                grad: String = "", admit: String = "", sf: String = "",
                f2: Seq[String] = Seq.fill(5)(""),
                f1a: Seq[String] = Seq.fill(4)(""),
                f3: Seq[String] = Seq.fill(4)("")): String = {
    require(f2.size == 5 && f1a.size == 4 && f3.size == 4)
    (Seq(unitid, name, ein, enroll, ft, ret, grad, admit, sf) ++ f2 ++ f1a ++ f3)
      .mkString(",")
  }

  // U1: healthy FASB; U2: GASB; U3: small shrinking FASB school (cliff +
  // enrollment floor + revenue collapse floor); U4/U5: subsidiary pair
  // sharing EIN 77001 with assets within 1%; U6: no financials and no
  // enrollment in either recent year -> likely closed; U7: no IPEDS
  // financials, 990-injected.
  private lazy val scored: DataFrame = {
    val y2023 = writeYear("ipeds23.csv", "2223", Seq(
      r("U1", "Alpha College", "11001", "5000", "4500", "90", "75", "35", "11",
        f2 = Seq("2000000", "600000", "1400000", "900000", "850000")),
      r("U2", "Beta State", "22001", "12000", "9000", "82", "60", "70", "16",
        f1a = Seq("5000000", "2500000", "2000000", "1900000")),
      r("U3", "Gamma Academy", "33001", "450", "400", "70", "45", "85", "14",
        f2 = Seq("300000", "200000", "100000", "200000", "210000")),
      r("U4", "Delta Univ", "77001", "8000", "7000", "85", "65", "50", "13",
        f2 = Seq("4000000", "1500000", "2500000", "1500000", "1400000")),
      r("U5", "Delta Univ - Online", "77001", "900", "800", "75", "50", "80", "20",
        f2 = Seq("3970000", "1480000", "2490000", "400000", "390000")),
      r("U6", "Omega Institute", "66001", ret = "60", grad = "30"),
      r("U7", "Sigma Seminary", "55001", "300", "250", "78", "55", "60", "10")))
    val y2024 = writeYear("ipeds24.csv", "2324", Seq(
      r("U1", "Alpha College", "11001", "5100", "4600", "91", "76", "34", "11",
        f2 = Seq("2100000", "620000", "1480000", "950000", "880000")),
      r("U2", "Beta State", "22001", "11800", "8900", "81", "61", "71", "16",
        f1a = Seq("5100000", "2550000", "2050000", "1950000")),
      // U3: enrollment 450 -> 350 (-22%), revenue 200000 -> 80000 (-60%)
      r("U3", "Gamma Academy", "33001", "350", "300", "65", "40", "88", "15",
        f2 = Seq("250000", "190000", "60000", "80000", "150000")),
      r("U4", "Delta Univ", "77001", "8100", "7100", "86", "66", "49", "13",
        f2 = Seq("4100000", "1520000", "2580000", "1550000", "1450000")),
      r("U5", "Delta Univ - Online", "77001", "950", "850", "76", "51", "79", "19",
        f2 = Seq("4080000", "1510000", "2570000", "420000", "400000")),
      r("U6", "Omega Institute", "66001"),
      r("U7", "Sigma Seminary", "55001", "310", "260", "79", "56", "59", "10")))
    import spark.implicits._
    val f990 = Seq(
      ("55001", 2024, 120000.0, 110000.0, 500000.0, 300000.0))
      .toDF("ein", "year", "total_revenue", "total_expenses", "total_assets", "net_assets")
    val panel = Ipeds.buildPanel(Seq(
      Ipeds.standardizeYear(Ingest.readCsv(spark, y2023), 2023),
      Ipeds.standardizeYear(Ingest.readCsv(spark, y2024), 2024)),
      Some(f990))
    Ipeds.score(panel).cache()
  }

  private def row(u: String, y: Int) =
    scored.filter(s"unitid = '$u' AND year = $y").collect().head

  private def d(r: org.apache.spark.sql.Row, c: String): Option[Double] = {
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  test("accounting standard detected from populated finance section") {
    assert(row("U1", 2024).getString(row("U1", 2024).fieldIndex("accounting_std")) == "fasb")
    assert(row("U2", 2024).getString(row("U2", 2024).fieldIndex("accounting_std")) == "gasb")
  }

  test("metrics coalesce across FASB/GASB sections") {
    assert(d(row("U2", 2024), "total_revenue").get === 2050000.0 +- 1e-6)
    assert(d(row("U2", 2024), "net_assets").get === 2550000.0 +- 1e-6)
    // derived liabilities for GASB: assets - net position
    assert(d(row("U2", 2024), "total_liabilities").get === 2550000.0 +- 1e-6)
  }

  test("subsidiary sharing an EIN with ~equal assets is contaminated") {
    val r5 = row("U5", 2024)
    assert(r5.getBoolean(r5.fieldIndex("is_subsidiary")))
    assert(d(r5, "total_assets").isEmpty)       // balance sheet nulled
    assert(d(r5, "ind_equity_ratio").isEmpty)   // solvency dropped out
    val r4 = row("U4", 2024)
    assert(!r4.getBoolean(r4.fieldIndex("is_subsidiary")))
    assert(d(r4, "ind_equity_ratio").nonEmpty)
  }

  test("990 injection backfills financials by EIN and tags the standard") {
    val r = row("U7", 2024)
    assert(r.getBoolean(r.fieldIndex("injected_990")))
    assert(r.getString(r.fieldIndex("accounting_std")) == "irs990")
    assert(d(r, "total_revenue").get === 120000.0 +- 1e-6)
    assert(d(r, "ind_operating_margin").nonEmpty)
  }

  test("likely-closed unit is flagged and not scored") {
    val r = row("U6", 2024)
    assert(r.getBoolean(r.fieldIndex("likely_closed")))
    assert(d(r, "final_score").isEmpty)
    assert(r.getString(r.fieldIndex("risk_category")) == "Likely Closed")
    assert(!row("U1", 2024).getBoolean(row("U1", 2024).fieldIndex("likely_closed")))
  }

  test("cliff multiplier boosts the enrollment domain for small shrinking schools") {
    val r3 = row("U3", 2024)
    // U3 2024: enrollment 350 (<500 -> sizeF 1.0), cagr -22% (<=-15% -> chgF 1.0)
    // -> mult 1.4; domain is capped at 100
    val dom = d(r3, "domain_enrollment").get
    assert(dom > 99.9) // 1.4 * (scored ~1.0 indicators * 100) capped at 100
    val r1 = row("U1", 2024)
    // healthy large school: multiplier 1.0, tiny domain score
    assert(d(r1, "domain_enrollment").get < 20.0)
  }

  test("revenue-collapse and enrollment floors raise the final score") {
    val r = row("U3", 2024)
    // revenue cagr -60% <= -0.55 -> floor 65
    assert(d(r, "final_score").get >= 65.0 - 1e-9)
    assert(d(r, "final_score").get >= d(r, "composite_score").get - 1e-9)
    assert(Set("High", "Severe")(r.getString(r.fieldIndex("risk_category"))))
  }

  test("ipeds weights are consistent") {
    val cfg = Ipeds.config
    assert(math.abs(cfg.domains.map(_.weight).sum - 1.0) < 1e-9)
    cfg.domains.foreach { dm =>
      val s = cfg.indicators.filter(_.domain == dm.name).map(_.weight).sum
      assert(math.abs(s - 1.0) < 1e-9, s"domain ${dm.name}: $s")
    }
  }
}
