package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A2 — the reference's custom incremental count UDAF, re-expressed as a
  * Spark `Aggregator`.
  *
  * Reference: `class CountAggregate implements AggregateFunction<Tuple2,
  * Long, Long>` with `createAccumulator=0; add=acc+1; getResult=acc;
  * merge=a+b` (reference StreamJobTumblingOffset.java:176–200). The
  * method mapping is 1:1: zero/reduce/finish/merge. Spark applies it as
  * partial (map-side) + final aggregation, preserving the incremental
  * accumulate/merge contract.
  *
  * Production code should use the built-in `count` (codegen'd); this
  * exists to exercise the user-defined-aggregate surface for parity.
  */
object CountAggregate extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(acc: Long, in: Long): Long = acc + 1L
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column form: `count_agg($"anyLongCol")`. */
  def apply(c: Column): Column = udaf(CountAggregate).apply(c)
}
