package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Same-process A/B timer for the unigram Viterbi DP rewrite (the host
  * drifts 25-40% between JVMs, so cross-run bench numbers cannot separate
  * a regression from drift). Times the carried-segs DP (the round-8 form)
  * against the backpointer DP on the real word frame, alternating. */
object AbUnigram {
  private val oldExpr: Column = expr(
    s"""aggregate(
       |  sequence(1, length(word)),
       |  array(named_struct(
       |    'k', 0, 'negs', CAST(0 AS BIGINT),
       |    'segs', CAST(array() AS array<string>))),
       |  (acc, i) -> acc || array(element_at(transform(slice(array_sort(
       |    transform(
       |      filter(sequence(1, least(i, 4)),
       |        l -> l = 1 OR map_contains_key(vm, substring(word, i - l + 1, l))),
       |      l -> named_struct(
       |        'k', element_at(acc, i - l + 1).k + 1,
       |        'negs', element_at(acc, i - l + 1).negs
       |          - coalesce(element_at(vm, substring(word, i - l + 1, l)),
       |                     CAST(0 AS BIGINT)),
       |        'negl', -l,
       |        'segs', element_at(acc, i - l + 1).segs
       |          || array(substring(word, i - l + 1, l))))),
       |    1, 1), x -> named_struct('k', x.k, 'negs', x.negs, 'segs', x.segs)),
       |    1)),
       |  acc -> element_at(acc, -1).segs)""".stripMargin)

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
      val words = graft.ops.Unigram.trainedWords(spark, sfDir)
      words.count()
      val vocab = graft.ops.Unigram.trained(spark, sfDir)
      val vm = vocab.agg(
        map_from_entries(collect_list(struct(col("piece"), col("score"))))
          .as("vm"))
      def run(e: Column): Double = {
        val t0 = System.nanoTime()
        words.crossJoin(broadcast(vm))
          .select(col("word"), col("cnt"), e.as("segs"))
          .select(sum(size(col("segs")))).head()
        (System.nanoTime() - t0) / 1e9
      }
      for (r <- 1 to 4) {
        val a = run(oldExpr)
        val b = run(graft.ops.Unigram.segmentExpr)
        println(f"rep$r old=$a%7.3f new=$b%7.3f")
      }
      // equality: the rewrite must produce the identical segmentation
      val both = words.crossJoin(broadcast(vm))
        .select(col("word"), oldExpr.as("a"),
          graft.ops.Unigram.segmentExpr.as("b"))
        .filter(not(col("a") === col("b"))).count()
      println(s"mismatches=$both")
    } finally {
      graft.core.SharedFrames.clear()
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
