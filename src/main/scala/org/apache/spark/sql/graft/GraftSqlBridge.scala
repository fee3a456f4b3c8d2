package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` surface — the standard pattern for extension
  * libraries that build their own [[LogicalPlan]] nodes: the only
  * non-private way to wrap a custom plan in a DataFrame is
  * `Dataset.ofRows`, which is `private[sql]`, so this shim lives under the
  * `org.apache.spark.sql` namespace. No other internals touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
