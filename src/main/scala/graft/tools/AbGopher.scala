package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-process cost breakdown for the gopher repetition bundle: gram
  * construction vs sort vs full run-fold, to find where the shared-frame
  * build time actually goes. */
object AbGopher {
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
    graft.core.Tables.cacheScans = true
    try {
      val base = graft.core.Tables.documents(spark, sfDir)
        .withColumn("words", split(trim(col("text")), "\\s+"))
      base.count()
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      def gramsN(n: Int) = expr(
        s"""CASE WHEN size(words) >= $n THEN
           |  transform(sequence(1, size(words) - $n + 1),
           |    i -> concat_ws(' ', slice(words, i, $n)))
           |ELSE CAST(array() AS array<string>) END""".stripMargin)
      def oldBuild() = {
        val grams = base
          .withColumn("total_chars", length(trim(col("text"))).cast("long"))
          .select(col("doc_id"), col("total_chars"), explode(expr(
            """flatten(transform(sequence(2, 6), n ->
              |  CASE WHEN size(words) >= n THEN
              |    transform(sequence(1, size(words) - n + 1),
              |      i -> struct(n AS n, concat_ws(' ', slice(words, i, n)) AS gram))
              |  ELSE CAST(array() AS array<struct<n: int, gram: string>>)
              |  END))""".stripMargin)).as("g"))
          .select(col("doc_id"), col("total_chars"),
            col("g.n").as("n"), col("g.gram").as("gram"))
        val counted = grams.groupBy("doc_id", "total_chars", "n", "gram")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("covered", col("cnt") * length(col("gram")).cast("long"))
        val perN = counted.groupBy("doc_id", "total_chars", "n")
          .agg(
            min(struct((-col("cnt")).as("negc"), col("gram").as("gram"),
              col("covered").as("covered"))).as("top"),
            sum(when(col("cnt") > 1, col("covered")).otherwise(0L)).as("dupc"))
          .select(col("doc_id"), col("total_chars"), col("n"),
            col("top.covered").as("topc"), col("dupc"))
        perN.groupBy("doc_id", "total_chars")
          .agg(
            sum(when(col("n") === 2, col("topc")).otherwise(0L)).as("top2"),
            sum(when(col("n") === 5, col("dupc")).otherwise(0L)).as("dup5"))
          .select(sum(col("top2") + col("dup5"))).head()
      }
      def hofBuild() = {
        // the round-9 in-row fold (repRunStats), pre-native-expression
        val b = base
          .withColumn("total_chars", length(trim(col("text"))).cast("long"))
          .withColumn("r2", graft.queries.TextQueries.repRunStats(2))
          .withColumn("r3", graft.queries.TextQueries.repRunStats(3))
          .withColumn("r4", graft.queries.TextQueries.repRunStats(4))
          .withColumn("r5", graft.queries.TextQueries.repRunStats(5))
          .withColumn("r6", graft.queries.TextQueries.repRunStats(6))
        b.select(sum(col("r2.topc") + col("r3.topc") + col("r4.topc") +
          col("r5.dup") + col("r6.dup"))).head()
      }
      for (r <- 1 to 3) {
        t(s"rep$r OLD grouped build") { oldBuild() }
        t(s"rep$r HOF in-row build") { hofBuild() }
        t(s"rep$r NATIVE expr build") {
          // touch every output column or pruning drops the folds
          graft.queries.TextQueries.gopherBuildForAb(spark, sfDir)
            .select(sum(col("top2_frac") + col("top3_frac") +
              col("top4_frac") + col("dup5_frac") + col("dup6_frac") +
              when(col("gopher_keep"), 1.0).otherwise(0.0))).head()
        }
      }
    } finally {
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
