package graft.tools
import org.apache.spark.sql.SparkSession
object SortCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_scan_project")(spark, "/root/testdata/sf0.001")
    // what Bench.timed actually executes
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    println("SORT-IN-COUNT-PLAN: " + plan.contains("Sort"))
    val plan2 = df.queryExecution.executedPlan.toString
    println("SORT-IN-BARE-PLAN: " + plan2.contains("Sort"))
    spark.stop()
  }
}
