package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Buffer for [[ArgMax]]: the best ordering key seen so far and the
  * value that carried it, both held as (copied) Catalyst internal
  * representations; `ord == null` means no qualifying row yet. */
final class ArgMaxBuffer(var ord: Any, var value: Any)

/** `argmax(value, ordering)`: the `value` of the row with the greatest
  * `ordering`, as a native `TypedImperativeAggregate`.
  *
  * Why not the built-ins: with a multi-column (struct) ordering,
  * `max(struct(...))` and `max_by(...)` are both DeclarativeAggregates
  * whose buffer holds the struct — not a mutable fixed-width type, so
  * HashAggregateExec rejects the buffer and Spark falls back to
  * SortAggregate, which sorts every partition by the grouping key
  * before (partial) and after (final) the shuffle. A
  * TypedImperativeAggregate instead plans as ObjectHashAggregate:
  * hash-based with map-side partial combine, ONE shuffle of one
  * serialized (ordering, value) pair per (partition × group), no sort
  * anywhere — the plan shape an argmax compaction needs at 100 TB.
  * PlanSpec pins this (q_latest_snapshot must not plan a sort or a
  * window).
  *
  * Semantics match SQL `max_by`: rows whose ordering is NULL are
  * ignored; with no qualifying rows the result is NULL; ties return
  * the first-seen maximum, so callers wanting determinism make the
  * ordering total (q_latest_snapshot tie-breaks on the unique key).
  */
case class ArgMax(
    valueExpr: Expression,
    orderingExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuffer] with BinaryLike[Expression] {

  override def left: Expression = valueExpr
  override def right: Expression = orderingExpr
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "argmax"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderingExpr.dataType)

  override def createAggregationBuffer(): ArgMaxBuffer = new ArgMaxBuffer(null, null)

  override def update(buf: ArgMaxBuffer, input: InternalRow): ArgMaxBuffer = {
    val o = orderingExpr.eval(input)
    if (o != null && (buf.ord == null || ordering.compare(o, buf.ord) > 0)) {
      // eval results may alias engine-reused memory — copy both
      buf.ord = InternalRow.copyValue(o)
      buf.value = InternalRow.copyValue(valueExpr.eval(input))
    }
    buf
  }

  override def merge(a: ArgMaxBuffer, b: ArgMaxBuffer): ArgMaxBuffer = {
    if (b.ord != null && (a.ord == null || ordering.compare(b.ord, a.ord) > 0)) {
      a.ord = b.ord
      a.value = b.value
    }
    a
  }

  override def eval(buf: ArgMaxBuffer): Any = buf.value

  // shuffle wire format: one UnsafeRow [ordering, value]
  @transient private lazy val serProj =
    UnsafeProjection.create(Array(orderingExpr.dataType, valueExpr.dataType))

  override def serialize(buf: ArgMaxBuffer): Array[Byte] =
    serProj(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    // copy out: the row aliases `bytes`, the buffer must own its data
    new ArgMaxBuffer(
      InternalRow.copyValue(row.get(0, orderingExpr.dataType)),
      InternalRow.copyValue(row.get(1, valueExpr.dataType)))
  }

  override def withNewMutableAggBufferOffset(n: Int): ArgMax = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ArgMax = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgMax =
    copy(valueExpr = l, orderingExpr = r)
}

object ArgMax {
  /** Column wrapper: `argMax(value, ordering)` aggregate. */
  def argMax(value: Column, ordering: Column): Column =
    Bridge.column(
      ArgMax(Bridge.expression(value), Bridge.expression(ordering)).toAggregateExpression())
}
