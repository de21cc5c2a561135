package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]` in Spark 4 — same bridge pattern
  * as [[ColumnBridge]] (public extension libraries define exactly this
  * shim to materialize a DataFrame from a hand-built LogicalPlan).
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
