package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hid the Expression ↔ Column seam behind `private[sql]`
  * (`Column` wraps a `ColumnNode`, not a catalyst `Expression`). Custom
  * codegen'd expressions still need that seam, so this one-file bridge
  * lives in an `org.apache.spark.sql` subpackage — the standard pattern
  * for Spark extension libraries — and re-exports the two conversions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
