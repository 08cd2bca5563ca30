package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-only bridge: materialize a DataFrame from a logical sub-plan
  * (`Dataset.ofRows` is `private[sql]` in Spark 4). Used by PlanSpec's
  * window-cardinality guard to measure the partition-key cardinality
  * of a Window node's CHILD, which has no public handle. */
object TestBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
