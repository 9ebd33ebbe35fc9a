package graft.core

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x hides the `Column(expr)` constructor behind the classic shim;
  * this (plus the one-file org.apache.spark.sql.GraftSqlShims) is the
  * single place in the codebase that touches it, so custom Catalyst
  * expressions stay easy to audit.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = GraftSqlShims.column(e)

  /** Unwrap a Column into its Catalyst expression. */
  def expression(c: Column): Expression = GraftSqlShims.expression(c)
}
