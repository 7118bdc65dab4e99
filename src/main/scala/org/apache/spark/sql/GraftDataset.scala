package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Accessor for the package-private Dataset factory, so graft can wrap
  * its custom logical plans (e.g. BroadcastAsofJoin) as DataFrames.
  * Same pattern public Spark-extension libraries use. */
object GraftDataset {
  def ofPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
