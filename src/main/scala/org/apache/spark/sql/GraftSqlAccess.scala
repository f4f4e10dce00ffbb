package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public forwarding for sql-private Column <-> Expression conversion
  * (extension-shim technique; no Spark code, only forwarding). */
object GraftSqlAccess {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
