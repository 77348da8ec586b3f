package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-by-step timing probe for the events/JSON first-run cost. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.cacheScans = true
    try {
      // JVM warmup: same as Bench
      time("warmup lineitem+documents") {
        graft.core.Tables.t(spark, sfDir, "lineitem").count()
        graft.core.Tables.documents(spark, sfDir).count()
      }
      val pairs = time("jaccard pairs build") {
        val p = graft.SparkEntry.sharedFrames.toMap.apply("dedup_jaccard_pairs")(spark, sfDir)
        println("PROBE   pair rows = " + p.count())
        p
      }
      time("cc on jaccard pairs") {
        graft.ops.Dedup.connectedComponents(pairs).count()
      }
      time("cc again (same pairs)") {
        graft.ops.Dedup.connectedComponents(pairs).count()
      }
      val lsh = time("lsh pairs build") {
        val p = graft.SparkEntry.sharedFrames.toMap.apply("sim_lsh_pairs")(spark, sfDir)
        println("PROBE   lsh pair rows = " + p.count())
        p.select(col("id_a"), col("id_b"))
      }
      time("cc on lsh pairs") {
        graft.ops.Dedup.connectedComponents(lsh).count()
      }
    } finally {
      graft.core.SharedFrames.clear()
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
