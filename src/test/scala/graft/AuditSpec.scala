package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Audit

/** Single-pass observed metrics: the audit numbers a pipeline logs while
  * writing must equal a direct aggregation — and must arrive from the
  * write action itself, with no second scan. */
class AuditSpec extends SparkSuite {

  test("observed metrics from a parquet write equal direct aggregation") {
    val docs = graft.core.Tables.documents(spark, sf)
      .withColumn("n_tokens",
        size(regexp_extract_all(col("text"), lit("""\S+"""), lit(0))))
    val (observedDf, obs) = Audit.observed(docs, "write_audit",
      count(lit(1)).as("n_rows"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("null_lang"),
      sum(col("n_tokens").cast("long")).as("total_tokens"),
      min(col("doc_id")).as("min_id"))
    val out = Files.createTempDirectory("graftaudit").toFile.getAbsolutePath
    observedDf.write.mode("overwrite").parquet(s"$out/docs.parquet")
    val m = obs.get
    val direct = docs.agg(
      count(lit(1)), sum(when(col("lang").isNull, 1L).otherwise(0L)),
      sum(col("n_tokens").cast("long")), min(col("doc_id"))).head()
    assert(m("n_rows") == direct.getLong(0))
    assert(m("null_lang") == direct.getLong(1))
    assert(m("total_tokens") == direct.getLong(2))
    assert(m("min_id") == direct.getLong(3))
    // and the written data is complete (the metrics audited THIS pass)
    assert(spark.read.parquet(s"$out/docs.parquet").count() == direct.getLong(0))
  }
}
