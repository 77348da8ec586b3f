package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-process A/B for the normText idiom: the regex formulation
  * (written as '\s\s*' so [[graft.functions.NormTextRewrite]] cannot
  * rewrite it) vs the native one-pass [[graft.functions.NormTextExpr]].
  * Both sides hash every output byte (xxhash64 aggregate) so column
  * pruning cannot delete the expression under test, and the two hashes
  * must AGREE — the A/B doubles as an end-to-end equality check on the
  * full corpus. */
object AbNormText {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.installOptimizations(spark)
    graft.core.Tables.cacheScans = true
    try {
      val docs = graft.core.Tables.documents(spark, sfDir)
      docs.count() // cache the scan; both sides pay decode equally
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val h = f
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s  hash=$h")
      }
      for (r <- 1 to 3) {
        t(s"rep$r regex normText") {
          docs.select(xxhash64(
              trim(regexp_replace(lower(col("text")), """\s\s*""", " ")))
            .as("h")).agg(sum(col("h"))).head().getLong(0)
        }
        t(s"rep$r native norm_text") {
          docs.select(xxhash64(
              graft.functions.NormText.normText(col("text"))).as("h"))
            .agg(sum(col("h"))).head().getLong(0)
        }
      }
    } finally {
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
