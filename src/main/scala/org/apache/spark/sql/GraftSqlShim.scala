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

  /** Column over a custom Catalyst expression — needed for expressions
    * that carry non-Expression state (e.g. a Broadcast handle), which the
    * function-registry route (literal args only) cannot construct.
    * `ExpressionUtils.column` is `private[sql]`, same doorway rationale
    * as [[ofRows]]. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse doorway: a Column's resolved/unresolved Catalyst
    * expression, for embedding as a child of a custom expression. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
