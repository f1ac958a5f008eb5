package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Expression↔Column conversions —
  * the standard seam Spark extension libraries use (the stable public
  * alternative, Column.fn, only covers registered functions). Kept to
  * these two calls; everything else in graft sits outside Spark's
  * namespace. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
