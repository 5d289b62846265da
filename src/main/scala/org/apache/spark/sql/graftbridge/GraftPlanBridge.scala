package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** The one org.apache.spark.sql-package shim in this library: wrapping a
  * custom LogicalPlan into a DataFrame needs `Dataset.ofRows`, whose
  * enclosing object is private[sql] in Spark 4 — the standard extension
  * seam used by Spark connector/extension libraries. Nothing else reaches
  * into Spark internals from here. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
