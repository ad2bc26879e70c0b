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

  /** Register a temp SQL function into a live session's registry. */
  def registerFunction(s: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
