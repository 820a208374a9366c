package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** `private[sql]` escape hatch for building Columns from custom Catalyst
  * expressions (the same technique every Spark extension library uses —
  * frameless, spark-daria, sedona all ship an `org.apache.spark.sql`
  * bridge object). Kept to the two minimal conversions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * `private[sql]`) — the entry point for whole-operator custom plans
    * (graft.plans.AsOfJoin).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
