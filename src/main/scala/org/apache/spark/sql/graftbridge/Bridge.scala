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

  /** The persisted RDDs backing a checkpoint-detached frame — the
    * `LogicalRDD` leaves of its analyzed plan. Lets a caller that
    * `localCheckpoint(true)`ed a frame release EXACTLY that snapshot's
    * blocks, instead of diffing `sparkContext.getPersistentRDDs`
    * before/after (which, on a shared SparkContext, would sweep up any
    * RDD another thread persisted in the window and silently evict an
    * unrelated cache). */
  def checkpointRdds(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
