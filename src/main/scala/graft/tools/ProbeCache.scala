package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: task/GC seconds of simple aggregations over the cached tables
  * under the bench config — isolates whether the r12 cache repartition
  * changed the cost of READING the cache (recompute? GC? decode?). */
object ProbeCache {
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
    val taskNanos = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        taskNanos.addAndGet(s.stageInfo.taskMetrics.executorRunTime * 1000000L)
        gcMs.addAndGet(s.stageInfo.taskMetrics.jvmGCTime)
      }
    })
    try {
      def t(name: String)(f: => Any): Unit = {
        Thread.sleep(300)
        val (n0, g0) = (taskNanos.get(), gcMs.get())
        val t0 = System.nanoTime()
        val r = f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$name%-34s ${wall}%7.3f s  taskSec=${(taskNanos.get() - n0) / 1e9}%8.3f gcSec=${(gcMs.get() - g0) / 1e3}%6.2f  r=$r")
      }
      // synthetic control: same row count, no parquet, cached at 32
      val rng = spark.range(600000).repartition(32)
        .select(col("id"), (col("id") % 1000).as("v")).cache()
      t("build range cache")(rng.count())
      for (r <- 1 to 3)
        t(s"rep$r range agg")(rng.agg(min("v"), max("v"),
          count(lit(1))).collect().length)
      val li = graft.core.Tables.lineitem(spark, sfDir)
      t("build cache (count)")(li.count())
      for (r <- 1 to 3) {
        t(s"rep$r minmax agg")(li.agg(min("l_extendedprice"),
          max("l_extendedprice"), count(lit(1))).collect().length)
        t(s"rep$r groupBy flag")(li.groupBy("l_returnflag")
          .agg(sum("l_quantity")).collect().length)
        t(s"rep$r filter+count")(li.filter(col("l_quantity") > 25)
          .agg(count(lit(1))).collect().length)
      }
    } finally {
      graft.core.SharedFrames.clear()
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
