package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so scan
  * pruning (PushedFilters/ReadSchema), broadcast choices, and
  * whole-stage-codegen spans can be reviewed. Usage:
  *   sbt "runMain graft.Explain q_scan_project q_star_join"
  * (no args = a representative default set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_scan_project", "q_star_join", "q_distress_scores",
        "q_dedup_minhash", "q_asof_exec", "q_kmv_distinct")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => println(fn(spark, "/root/testdata/sf0.001").queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
