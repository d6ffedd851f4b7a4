package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows that Spark 4 keeps out
  * of the public API. Lives in the `org.apache.spark.sql` package
  * solely to let graft materialize a DataFrame from a hand-built
  * LogicalPlan (the manifest-backed HadoopFsRelation scan); no Spark
  * internals are modified.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
