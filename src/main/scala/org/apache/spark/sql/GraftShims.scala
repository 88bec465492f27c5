package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the private[sql] Dataset constructor — the one internal
  * hook a library adding its own LogicalPlan nodes needs (Spark 4
  * keeps plan↔Dataset construction encapsulated; extension libraries
  * conventionally ship exactly this shim). */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
