package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_tfidf_pairs decomposition (r12, VERDICT #6): time each pipeline
  * PREFIX with the noop sink (computes every column, no count-pruning)
  * in one JVM, steady state, so the 2.3 s headline is attributed to a
  * stage — scan, df aggregation, weighted frame, pair join, pair
  * aggregation, or the full query. */
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
    graft.core.Tables.cacheScans = true
    try {
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      val sh = graft.core.SharedFrames.cached(spark, s"shingles:$sfDir") {
        graft.ops.Dedup.shingles(
          graft.core.Tables.documents(spark, sfDir), maxShingleFreq = Some(20))
      }
      t("warm shingles")(sh.count())
      val L = 232792560L
      val two28 = 1L << 28
      def dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      def wsh = sh.join(dfs, Seq("shingle"))
        .withColumn("w2",
          (lit(L).cast("long") / col("df")).cast("long") *
            (lit(L).cast("long") / col("df")).cast("long"))
        .select(col("doc_id"), col("shingle").as("feat"),
          expr(s"w2 div $two28").as("w2h"), (col("w2") % two28).as("w2l"))
      def pairRows = wsh.select(col("doc_id").as("id_a"), col("feat"),
          col("w2h"), col("w2l"))
        .join(wsh.select(col("doc_id").as("id_b"), col("feat")), Seq("feat"))
        .filter(col("id_a") < col("id_b"))
      def dots = pairRows.groupBy("id_a", "id_b")
        .agg(sum("w2h").as("sh"), sum("w2l").as("sl"),
          count(lit(1)).as("n_common"))
      for (r <- 1 to 3) {
        t(s"rep$r 1 dfs agg")(noop(dfs))
        t(s"rep$r 2 wsh (dfs join)")(noop(wsh))
        t(s"rep$r 3 pair join rows")(noop(pairRows))
        t(s"rep$r 4 pair agg (dots)")(noop(dots))
        t(s"rep$r 5 full query")(noop(
          graft.SparkEntry.queries("q_tfidf_pairs")(spark, sfDir)))
      }
      println(s"pair join output rows = ${pairRows.count()}")
      println(s"wsh rows = ${wsh.count()}, sh rows = ${sh.count()}")
    } finally { graft.core.SharedFrames.clear(); spark.stop() }
  }
}
