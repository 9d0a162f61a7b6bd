package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows` — the standard pattern
  * for libraries that construct resolved [[LogicalPlan]]s directly (a
  * custom operator node has no public constructor path into a
  * DataFrame). Spark 4 moved the concrete implementation to
  * `org.apache.spark.sql.classic`; local-mode sessions are always
  * classic. This is the only member the engine places in the Spark
  * namespace, and it adds no behavior.
  */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
