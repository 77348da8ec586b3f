package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object AbTfidf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.installOptimizations(spark)
    try {
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      // pre-materialize like the bench does
      t("warm shared") { graft.SparkEntry.sharedFrames.foreach { case (n, b) =>
        if (n.startsWith("dedup")) b(spark, sfDir).count() } }
      for (r <- 1 to 3) {
        t(s"rep$r q_tfidf_pairs") {
          graft.SparkEntry.queries("q_tfidf_pairs")(spark, sfDir).collect()
        }
      }
    } finally { graft.core.SharedFrames.clear(); spark.stop() }
  }
}
