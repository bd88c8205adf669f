package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` hook a library-defined operator needs: hand a
  * custom resolved [[LogicalPlan]] back to the public DataFrame API
  * (`Dataset.ofRows` is package-private by design; every Spark-extension
  * library bridges it exactly like this). Nothing else in the graft
  * codebase lives outside the `graft` namespace. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
