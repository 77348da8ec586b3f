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
      val ev = time("events cache build (count)") {
        val e = graft.core.Tables.events(spark, sfDir)
        e.count(); e
      }
      println("PROBE cached partitions = " + ev.rdd.getNumPartitions)
      val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
      time("from_json forced (agg sum)") {
        graft.core.Tables.events(spark, sfDir)
          .select(from_json(col("props"), schema).getField("k").as("k"))
          .agg(sum("k")).collect()
      }
      time("from_json forced again") {
        graft.core.Tables.events(spark, sfDir)
          .select(from_json(col("props"), schema).getField("k").as("k"))
          .agg(sum("k")).collect()
      }
      time("q_events_from_json full first") {
        graft.queries.EventsQueries.queries("q_events_from_json")(spark, sfDir).count()
      }
      time("q_events_from_json full second") {
        graft.queries.EventsQueries.queries("q_events_from_json")(spark, sfDir).count()
      }
      time("q_events_variant full first") {
        graft.queries.EventsQueries.queries("q_events_variant")(spark, sfDir).count()
      }
      time("q_events_json full first") {
        graft.queries.EventsQueries.queries("q_events_json")(spark, sfDir).count()
      }
    } finally {
      graft.core.SharedFrames.clear()
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
