package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Wraps a custom LogicalPlan into a DataFrame. `Dataset.ofRows` is
  * `private[sql]`, and it is the ONLY doorway from a hand-built logical
  * node into the public Dataset API — every extension framework that
  * adds a whole-operator node (as opposed to an expression) needs this
  * one call. Nothing else non-public is touched.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
