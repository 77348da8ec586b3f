package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Merge

/** Merge/integration semantics + the partitioned-write scale story. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  test("integrate: coalesce(new, old) per column, appends new columns") {
    val master = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("key", "score", "name")
    val updates = Seq((1L, 11.0, "X"), (2L, Double.NaN, "Y"))
      .toDF("key", "score", "category")
      .withColumn("score", when(isnan(col("score")), lit(null)).otherwise(col("score")))
    val got = Merge.integrate(master, updates, "key", Seq("score", "category"))
      .orderBy("key").collect()
    assert(got(0).getDouble(1) == 11.0)          // updated
    assert(got(1).getDouble(1) == 20.0)          // null update -> keep old
    assert(got(2).getDouble(1) == 30.0)          // no update row -> keep old
    assert(got(0).getString(2) == "a")           // untouched master col
    assert(got(0).getAs[String]("category") == "X")  // appended col
    assert(got(2).isNullAt(got(2).fieldIndex("category")))
  }

  test("updateIfBetter is idempotent (second run changes nothing)") {
    val master = Seq((1L, 10.0), (2L, 50.0)).toDF("key", "value")
    val updates = Seq((1L, 30.0), (2L, 40.0)).toDF("key", "value")
    val once = Merge.updateIfBetter(master, updates, "key", "value", (n, o) => n > o)
      .select("key", "value")
    val twice = Merge.updateIfBetter(once, updates, "key", "value", (n, o) => n > o)
    assert(twice.filter(col("action") === "updated").count() == 0)
    val vals = twice.orderBy("key").collect().map(_.getDouble(1)).toSeq
    assert(vals == Seq(30.0, 50.0))
  }

  test("HTML report sink embeds the projected rows as JSON") {
    val dir = Files.createTempDirectory("graftreport").toFile.getAbsolutePath
    val df = core.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey").limit(5)
    graft.sinks.HtmlReport.write(df, s"$dir/report.html")
    val html = Files.readString(java.nio.file.Paths.get(s"$dir/report.html"))
    assert(html.contains("\"c_custkey\":1"))
    assert(html.count(_ == '{') == 5)
    assert(!html.contains(graft.sinks.HtmlReport.Placeholder))
  }

  test("year-partitioned parquet writes enable partition pruning") {
    val dir = Files.createTempDirectory("graftpart").toFile.getAbsolutePath
    val panel = graft.ops.Panel.customerYear(spark, sf)
    panel.write.mode("overwrite").partitionBy("year").parquet(s"$dir/panel")
    val pruned = spark.read.parquet(s"$dir/panel").filter(col("year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan (no full-table read)
    assert(plan.contains("PartitionFilters") &&
      plan.contains("year") , s"no partition pruning in:\n$plan")
    assert(pruned.count() > 0)
    // a pruned read touches exactly one partition directory
    val years = new java.io.File(s"$dir/panel").listFiles()
      .filter(_.getName.startsWith("year=")).map(_.getName).toSet
    assert(years.size > 1 && years.contains("year=1996"))
  }

  test("ivmMerge: signed-delta merge == rebuild, and zeroed groups vanish") {
    // base: A has two rows (both later retracted), B one, C one
    val base = Seq(("A", 1L, BigDecimal("10.00")), ("A", 1L, BigDecimal("5.00")),
      ("B", 1L, BigDecimal("7.00")), ("C", 1L, BigDecimal("9.00")))
      .toDF("k", "cnt", "total")
    val view0 = base.groupBy("k")
      .agg(sum("cnt").as("cnt"), sum("total").as("total"))
    // changelog: retract both A rows, insert one B row and one new D row
    val delta = Seq(("A", -1L, BigDecimal("-10.00")), ("A", -1L, BigDecimal("-5.00")),
      ("B", 1L, BigDecimal("3.00")), ("D", 1L, BigDecimal("4.00")))
      .toDF("k", "cnt", "total")
      .groupBy("k").agg(sum("cnt").as("cnt"), sum("total").as("total"))
    val merged = Merge.ivmMerge(view0, delta, "k")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSeq
    // A zeroed out -> DROPPED, not a lingering 0-count row
    assert(merged == Seq(("B", 2L, "10"), ("C", 1L, "9"), ("D", 1L, "4")),
      merged.toString)
  }

  test("ivmMerge folds over many batches to the direct rollup, deletes included") {
    import org.apache.spark.sql.DataFrame
    val o = graft.core.Tables.orders(spark, sf).select(col("o_custkey"),
      col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    def signed(df: DataFrame, sign: Int): DataFrame =
      df.select(col("o_custkey"), lit(sign.toLong).as("cnt"),
        (col("price") * sign).cast("decimal(38,2)").as("total"))
        .groupBy("o_custkey")
        .agg(sum("cnt").as("cnt"), sum("total").cast("decimal(38,2)").as("total"))
    // four insert batches by orderkey stripe; batch 3 also RETRACTS the
    // batch-0 rows with orderkey % 20 == 0 (they arrived in batch 0)
    val batches: Seq[DataFrame] = (0 to 3).map { b =>
      val ins = signed(o.where(col("o_orderkey") % 4 === b), 1)
      if (b == 3)
        ins.unionByName(signed(
          o.where(col("o_orderkey") % 4 === 0 && col("o_orderkey") % 20 === 0), -1))
          .groupBy("o_custkey")
          .agg(sum("cnt").as("cnt"), sum("total").cast("decimal(38,2)").as("total"))
      else ins
    }
    // the merged output carries the input schema, so the view folds
    // into the next batch's view argument with no renaming
    val folded = batches.foldLeft(batches.head.limit(0)) { (view, delta) =>
      Merge.ivmMerge(view, delta, "o_custkey")
    }
    val direct = o.where(!(col("o_orderkey") % 20 === 0))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_rows"), sum("price").cast("decimal(38,2)").as("t"))
    val got = folded.orderBy("o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    val exp = direct.orderBy("o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    assert(got == exp, s"fold diverged: got ${got.take(3)} exp ${exp.take(3)}")
    assert(!got.exists(_._2 == 0L), "zero-count groups must be dropped")
  }
}
