package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one package-private doorway an external planner extension needs:
  * wrap a custom LogicalPlan as a DataFrame. `Dataset.ofRows` is
  * `private[sql]`, so this shim lives in Spark's package — the standard
  * technique third-party Spark extensions use for exactly this purpose
  * (SparkSessionExtensions lets us inject the strategy but offers no
  * public constructor for a Dataset over an injected logical node).
  * Nothing else from the private surface is touched.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
