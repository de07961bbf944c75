package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters
  * (`classic.ExpressionUtils`) so library code can wrap a custom
  * Catalyst expression as a `Column` WITHOUT the session function
  * registry — for helpers like [[graft.llmops.Text.hash60]] that build
  * Columns in contexts where no SparkSession (and hence no
  * `call_function` registration guarantee) is in scope. The standard
  * Spark-extension idiom: one object in the `org.apache.spark.sql`
  * package, no Spark internals re-implemented. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
