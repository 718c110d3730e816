package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one sanctioned crossing into Spark's `private[sql]` surface.
  *
  * A custom whole-operator `LogicalPlan` has no public construction path
  * back into a `DataFrame` (`Dataset.ofRows` is `private[sql]`), so this
  * two-method shim lives inside the `org.apache.spark.sql` namespace — the
  * same technique every Spark extension library uses for its plan builder.
  * Everything else in graft sticks to public APIs.
  */
object GraftSql {

  /** Build a DataFrame from a custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for composing custom plans
    * over existing declarative subtrees).
    */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** A Column over a custom catalyst Expression that carries a non-literal
    * constructor argument (e.g. a pre-built sketch object) and therefore
    * cannot route through the function registry's `call_function` path.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The catalyst expression behind a Column (inverse of [[column]]). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
