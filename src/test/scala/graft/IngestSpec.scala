package graft

import java.nio.file.Files

import graft.ingest.Ingest
import graft.ingest.Ingest.FieldSpec

/** Ingest-layer specs: the substring column resolver (S3), multi-year
  * union (S2), CSV round-trip sink (S5), and key normalization. */
class IngestSpec extends SparkSuite {

  private lazy val dir = Files.createTempDirectory("graftingest").toFile.getAbsolutePath

  test("resolver: substring match, exclusions, first-match-wins") {
    // headers shaped like IPEDS year-prefixed labels (FIXTURES.md B4)
    val cols = Seq(
      "unitid",
      "institution name (HD2024)",
      "DRVEF2024.Total  enrollment",
      "DRVEF2024.Full-time enrollment",
      "DRVEF2024.Part-time enrollment",
      "F2324_F2.Total assets",
      "F2324_F1A.Total assets")
    val specs = Seq(
      FieldSpec("unitid", "unitid"),
      FieldSpec("name", "institution name"),
      // exclusion list keeps "Total enrollment" from matching Full/Part-time
      FieldSpec("enrollment", "enrollment", exclude = Seq("full-time", "part-time")),
      FieldSpec("ft_enrollment", "full-time enrollment"),
      // first-match-wins: F2 (FASB) appears before F1A (GASB)
      FieldSpec("total_assets", "total assets"))
    val m = Ingest.resolve(cols, specs)
    assert(m("unitid") == "unitid")
    assert(m("name") == "institution name (HD2024)")
    assert(m("enrollment") == "DRVEF2024.Total  enrollment")
    assert(m("ft_enrollment") == "DRVEF2024.Full-time enrollment")
    assert(m("total_assets") == "F2324_F2.Total assets")
  }

  test("resolver: missing fields come back as null columns") {
    val p = s"$dir/wide.csv"
    Files.writeString(java.nio.file.Paths.get(p),
      "unitid,DRVEF2024.Total  enrollment\n100,5000\n200,")
    val df = Ingest.selectResolved(Ingest.readCsv(spark, p), Seq(
      FieldSpec("unitid", "unitid"),
      FieldSpec("enrollment", "enrollment"),
      FieldSpec("graduation_rate", "graduation rate")))
    assert(df.columns.toSeq == Seq("unitid", "enrollment", "graduation_rate"))
    val rows = df.orderBy("unitid").collect()
    assert(rows(0).getString(1) == "5000")
    assert(rows(0).isNullAt(2))     // unmatched spec -> null column
    assert(rows(1).isNullAt(1))     // empty cell -> null
  }

  test("multi-year union tags provenance and tolerates schema drift") {
    Files.writeString(java.nio.file.Paths.get(s"$dir/y1.csv"), "a,b\n1,x")
    Files.writeString(java.nio.file.Paths.get(s"$dir/y2.csv"), "a,c\n2,y")
    val df = Ingest.loadYears(spark, Seq(2023 -> s"$dir/y1.csv", 2024 -> s"$dir/y2.csv"))
    assert(df.columns.toSet == Set("a", "b", "c", "file_year"))
    assert(df.count() == 2)
    assert(df.filter("file_year = 2024 AND c = 'y'").count() == 1)
  }

  test("CSV sink round-trip (S5 overwrite semantics)") {
    val out = s"$dir/sink"
    val df = spark.range(3).toDF("id")
    df.write.mode("overwrite").option("header", "true").csv(out)
    df.write.mode("overwrite").option("header", "true").csv(out) // idempotent
    assert(spark.read.option("header", "true").csv(out).count() == 3)
  }

  test("page source: one row per file with name provenance + regex extract") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graftpages")
    Files.writeString(dir.resolve("alpha_college.txt"),
      "Alpha College sits on a beautiful campus.\nThe campus spans 120 acres in total.")
    Files.writeString(dir.resolve("beta_institute.txt"),
      "Beta Institute: 45 acres of land,\nfounded 1901.")
    val pages = Ingest.pageSource(spark, dir.toString)
    val got = pages
      .withColumn("acreage",
        regexp_extract(col("page_text"), "([0-9]+) acres", 1).cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got == Map("alpha_college.txt" -> 120, "beta_institute.txt" -> 45))
    // wholetext: the multi-line page stayed one row
    assert(pages.count() == 2)
  }

  test("latin-1 CSV survives byte-exact through read, normalize and fuzzy match") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    import org.apache.spark.sql.functions._
    // é=0xE9, ü=0xFC, plus 0x96 (Windows-1252 en-dash byte): ISO-8859-1
    // maps every byte b to codepoint U+00b, so the read must be the
    // identity on bytes — the reference reads latin-1 the same way
    // (engine_990.py:663) and a utf-8 misread would mangle all three
    val names = Seq("Café Müller", "BetaInstitute", "Plain College")
    val csv = ("id,name" +: names.zipWithIndex.map { case (n, i) => s"00${i + 1},$n" })
      .mkString("", "\n", "\n")
    val d = Files.createTempDirectory("graftlatin1")
    Files.write(d.resolve("inst.csv"), csv.getBytes(ISO_8859_1))
    val df = Ingest.readCsv(spark, d.resolve("inst.csv").toString)
    val got = df.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == names, "codepoints must be the latin-1 identity mapping")
    // byte-exact round-trip: re-encoding what Spark read reproduces the
    // original file bytes
    assert(got.mkString("\n").getBytes(ISO_8859_1).toSeq ==
      names.mkString("\n").getBytes(ISO_8859_1).toSeq)
    // normalizeKey must not disturb the non-ASCII payload downstream
    val keyed = df
      .withColumn("k", Ingest.normalizeKey(col("id")))
      .withColumn("name_norm",
        trim(regexp_replace(regexp_replace(lower(col("name")), "[^a-z0-9]+", " "),
          "\\s+", " ")))
    val rows = keyed.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("k")).toSeq == Seq("1", "2", "3"))
    // F2 name normalization: non-ASCII folds to a space separator, which
    // is what makes the latin-1 and ASCII spellings fuzzy-joinable
    assert(rows(0).getAs[String]("name_norm") == "caf m ller")
    val ascii = spark.createDataFrame(Seq((1L, "cafe muller"))).toDF("rid", "ref_norm")
      .withColumn("block", expr("left(ref_norm, 3)"))
    val matched = keyed.withColumn("block", expr("left(name_norm, 3)"))
      .join(ascii, Seq("block"))
      .withColumn("dist", levenshtein(col("name_norm"), col("ref_norm")))
      .filter(col("dist") <= 3)
      .collect()
    assert(matched.length == 1 &&
      matched(0).getAs[String]("name_norm") == "caf m ller",
      "blocked fuzzy match must land the latin-1 spelling on its ASCII twin")
  }

  test("key normalization strips leading zeros and whitespace") {
    val df = spark.createDataFrame(Seq(Tuple1(" 0012345 "), Tuple1("000"), Tuple1("9")))
      .toDF("k")
    val got = df.select(Ingest.normalizeKey(org.apache.spark.sql.functions.col("k")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("12345", "", "9"))
  }

  test("numeric coercion: invalid strings become NULL (to_numeric coerce parity)") {
    val df = spark.createDataFrame(Seq(("1.5", "a"), ("abc", "b"), ("", "c")))
      .toDF("v", "k")
    val got = Ingest.coerceNumeric(df, Seq("v")).orderBy("k").collect()
    assert(got(0).getDouble(0) == 1.5)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
  }
}
