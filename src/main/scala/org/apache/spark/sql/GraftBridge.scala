package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom logical
  * plan node (graft.plans.TopKPerKey). This is the standard extension
  * seam for libraries that add whole operators — the only alternative is
  * routing every custom node through SQL text. No Spark internals are
  * modified; this file merely lives in the org.apache.spark.sql package
  * to reach `Dataset.ofRows`. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
