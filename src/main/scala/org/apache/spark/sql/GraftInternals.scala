package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (Spark 4 moved these behind `org.apache.spark.sql.classic` for the
  * Connect refactor). Lives in the spark.sql package solely to satisfy
  * the access modifier; keep it minimal.
  */
object GraftInternals {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
