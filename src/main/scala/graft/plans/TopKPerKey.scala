package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, Expression, GenericInternalRow, JoinedRow, LessThan,
  LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, UnsafeRow,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Custom planner strategy: plan the idiomatic per-key top-k pattern
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *      .filter($"rn" <= n) }}}
  *
  * into a PARTIAL + FINAL bounded-heap operator instead of a full
  * WindowExec. The window form sorts EVERY row of every key per
  * partition (after shuffling all of them); this operator keeps a
  * k-row heap per key on the map side, so the shuffle carries at most
  * k rows per (map partition, key) — partial aggregation's bargain,
  * which Spark has for aggregates but not for rank-filters (its
  * InferWindowGroupLimit pre-prunes to the same bound but still sorts
  * and ranks inside a full WindowExec downstream). At 100 TB,
  * "top 5 per user" stops shuffling the fact table.
  *
  * Recognition is deliberately narrow — single row_number window
  * expression, non-empty partition spec, filter that is EXACTLY the
  * rank bound (`rn <= lit` / `rn < lit`) — anything else falls through
  * to Spark's own planning, so enabling the strategy can never change
  * semantics, only the plan. row_number's tie behavior is preserved:
  * both forms order by the same SortOrder, and for a non-total order
  * both are equally arbitrary within ties. The emitted rank column
  * keeps the original expression id, so parents resolve untouched.
  *
  * Opt-in like [[LevenshteinBandRule]]: `GraftExtensions` injects it
  * for `--conf spark.sql.extensions` sessions;
  * `spark.experimental.extraStrategies` adds it to a live session
  * (StrategySpec exercises that path and pins equality with the
  * window form on real data).
  */
object TopKPerKeyStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Filter(cond, w: logical.Window)
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case a @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(part, order, _)), _)
            if part.nonEmpty =>
          val kOpt = cond match {
            case LessThanOrEqual(attr: Attribute, Literal(k: Int, IntegerType))
              if attr.semanticEquals(a.toAttribute) => Some(k)
            case LessThan(attr: Attribute, Literal(k: Int, IntegerType))
              if attr.semanticEquals(a.toAttribute) => Some(k - 1)
            case _ => None
          }
          kOpt match {
            case Some(k) if k >= 1 =>
              // InferWindowGroupLimit may already sit below the window;
              // this operator subsumes it, so plan over its child
              val realChild = w.child match {
                case g: logical.WindowGroupLimit
                  if g.partitionSpec == part && g.orderSpec == order => g.child
                case c => c
              }
              val partialPass = TopKPerKeyExec(
                k, part, order, a.toAttribute, partial = true, planLater(realChild))
              TopKPerKeyExec(
                k, part, order, a.toAttribute, partial = false, partialPass) :: Nil
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Bounded per-key top-k. `partial = true` runs pre-shuffle with no
  * distribution requirement and emits its survivors unranked;
  * `partial = false` requires clustering on the keys (EnsureRequirements
  * inserts the exchange), re-selects across the partial survivors, and
  * emits rows with the row_number column appended. Memory per task is
  * (#keys in partition) × k rows — the hash-aggregate state class.
  */
case class TopKPerKeyExec(
    limit: Int,
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partitionExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = orderSpec
    val k = limit
    val isPartial = partial
    val rank = rankAttr
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(order, childOutput)
      // PriorityQueue dequeues the MAXIMUM per `ord`, i.e. the worst
      // row currently kept — exactly the eviction candidate
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      if (isPartial) heaps.valuesIterator.flatMap(_.iterator)
      else {
        val boundOut = childOutput :+ rank
        val outProj = UnsafeProjection.create(boundOut, boundOut)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.valuesIterator.flatMap { h =>
          h.toArray.sorted(ord).iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            outProj(joined(row, rankRow)).copy(): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
