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
}
