package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for q_dbscan's fixed-overhead hunt. */
object ProbeDbscan {
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
      time("warmup") {
        graft.core.Tables.documents(spark, sfDir).count()
      }
      val pairs = time("shared pairs") {
        val p = graft.SparkEntry.sharedFrames.toMap
          .apply("dedup_jaccard_pairs")(spark, sfDir)
        p.count(); p
      }
      val minPts = 2
      val p = pairs.select(col("id_a"), col("id_b"))
      val und = p.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      val deg = und.groupBy("src").agg(count(lit(1)).as("degree"))
      time("deg count") { deg.count() }
      val core = deg.filter(col("degree") >= minPts).select(col("src").as("id"))
      val coreEdges = p
        .join(core.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
        .select("id_a", "id_b")
      time("coreEdges count") { coreEdges.count() }
      val cc = time("cc") {
        val c = graft.ops.Dedup.connectedComponents(coreEdges)
        c.count(); c
      }
      time("full dbscan (rep1)") {
        graft.ops.Similarity.dbscan(pairs,
          graft.core.Tables.documents(spark, sfDir)
            .select(col("doc_id").as("vec_id")), minPts).count()
      }
      time("full dbscan (rep2)") {
        graft.ops.Similarity.dbscan(pairs,
          graft.core.Tables.documents(spark, sfDir)
            .select(col("doc_id").as("vec_id")), minPts).count()
      }
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      time("cc @2 shuffle partitions") {
        graft.ops.Dedup.connectedComponents(coreEdges).count()
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("cc AQE off") {
        graft.ops.Dedup.connectedComponents(coreEdges).count()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    } finally spark.stop()
  }
}
