package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the package-private Dataset constructor: building a
  * DataFrame from a custom LogicalPlan is the one extension operation
  * Spark exposes no public API for (SparkSessionExtensions injects
  * rules/strategies/functions, but plan *construction* stays
  * private[sql]). Standard practice for libraries shipping custom
  * operators; nothing in Spark is modified. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
