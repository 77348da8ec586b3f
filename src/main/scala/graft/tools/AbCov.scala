package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-process A/B for the covariance-numerator Gram shapes: struct
  * explode + post-generate element_at (shipped) vs in-row product array
  * + posexplode on an int key. */
object AbCov {
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
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      emb.count()
      val xsArr = transform(col("embedding"), x =>
        (x.cast("double") * lit(graft.ops.Similarity.IntScale.toDouble))
          .cast("long").cast("decimal(19,0)"))
      val d = emb.select(size(col("embedding"))).head().getInt(0)
      val pairs = for { i <- 1 to d; j <- i to d } yield (i, j)
      val idxLit = typedlit(pairs)
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      for (r <- 1 to 3) {
        t(s"rep$r OLD struct") {
          emb.withColumn("xs", xsArr)
            .select(col("xs"), explode(idxLit).as("t"))
            .groupBy((col("t._1") - 1).as("i"), (col("t._2") - 1).as("j"))
            .agg(sum(element_at(col("xs"), col("t._1")) *
              element_at(col("xs"), col("t._2"))).as("sij"))
            .agg(sum(col("sij"))).head()
        }
        t(s"rep$r NEW posexp") {
          emb.withColumn("xs", xsArr)
            .select(posexplode(transform(idxLit, p =>
              element_at(col("xs"), p.getField("_1")) *
                element_at(col("xs"), p.getField("_2")))).as(Seq("pos", "prod")))
            .groupBy("pos").agg(sum(col("prod")).as("sij"))
            .agg(sum(col("sij"))).head()
        }
        t(s"rep$r TIA 128bit") {
          val xsLong = transform(col("embedding"), x =>
            (x.cast("double") * lit(graft.ops.Similarity.IntScale.toDouble))
              .cast("long"))
          emb.select(xsLong.as("xs"))
            .agg(graft.functions.CovAccum.covAccum(col("xs"), d).as("cells"))
            .select(explode(col("cells")).as("c"))
            .agg(sum(col("c"))).head()
        }
      }
      println("dim=" + d + " pairs=" + pairs.size)
    } finally {
      graft.core.Tables.cacheScans = false
      spark.stop()
    }
  }
}
