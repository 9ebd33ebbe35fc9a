// Lives in org.apache.spark.sql so it can reach the private[sql]
// Expression<->Column bridge that Spark 4.x hides behind the classic shim.
// This is the ONLY file outside package graft; keep it tiny.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
