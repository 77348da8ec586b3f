package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` bridge the library needs: turning a custom
  * LogicalPlan into a DataFrame. `Dataset.ofRows` is the canonical
  * constructor every Spark-internal API uses; extensions that introduce
  * whole logical operators (here: [[graft.plans.AsOfJoinPlan]]) need the
  * same door, which Spark only opens to the `org.apache.spark.sql`
  * package — hence this shim's package. Nothing else in the repo lives
  * outside the `graft` namespace, and nothing else may be added here. */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
