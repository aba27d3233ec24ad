package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: turning a hand-built
  * [[LogicalPlan]] into a [[DataFrame]]. This is the standard packaging
  * pattern for Spark extension libraries that contribute whole logical
  * operators (Catalyst has no public constructor for "DataFrame from
  * plan"); everything else in the engine stays on the public API.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
