package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so the graft
  * library can materialize a DataFrame from a custom [[LogicalPlan]]
  * node (the (c)-tier extension path: logical node + planner strategy +
  * physical exec). This is the standard technique Spark-extension
  * libraries use — one object in `org.apache.spark.sql`, nothing else
  * reaches into internals.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
