package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Print the FINAL (post-execution) adaptive physical plan of registered
  * queries — under AQE, exchange/stage reuse only appears in the executed
  * plan, never in the pre-execution EXPLAIN that [[Explain]] prints (the
  * stage cache is consulted at runtime). The query is executed with the
  * noop-equivalent count first, then the re-optimized plan is dumped.
  * Usage: `sbt "runMain graft.tools.ExplainFinal q_lm_score"` (defaults to
  * sf0.001; set SPARK_GRAFT_SF_DIR to override). */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // honor the bench env so a plan can be inspected under the exact
    // config the bench times (core count, partitions, cached scans)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.installOptimizations(spark)
    if (sys.env.get("SPARK_GRAFT_CACHE").contains("1"))
      graft.core.Tables.cacheScans = true
    try {
      args.toSeq.foreach { n =>
        graft.SparkEntry.queries.get(n) match {
          case Some(fn) =>
            val df = fn(spark, sfDir)
            // collect() drives THIS QueryExecution (a noop write or a
            // count would execute a separate one and leave df's adaptive
            // plan unfinalized); results are sf0.001-sized
            df.collect()
            println(s"\n===== $n (final) =====")
            println(df.queryExecution.explainString(FormattedMode))
          case None => println(s"\n===== $n: NOT REGISTERED =====")
        }
      }
    } finally {
      graft.core.SharedFrames.clear()
      spark.stop()
    }
  }
}
