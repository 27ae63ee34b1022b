package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column <-> catalyst Expression
  * converters (Spark 4 moved them behind the Connect-compatible Column
  * API). Lives in the `org.apache.spark.sql` namespace solely to
  * satisfy the qualified-private access; used by graft's custom
  * expressions to expose themselves as `Column` functions. */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into an already-running session's registry
    * (extensions only apply at session construction). */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
