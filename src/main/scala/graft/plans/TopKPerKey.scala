package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection,
  UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
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
  * Memory rails (a replaced WindowExec could SPILL; this operator must
  * not OOM where vanilla planning survives):
  *  - the strategy refuses k > `spark.graft.topk.maxK` (default 1024)
  *    — a huge k literal means per-key state is no longer "small",
  *    so the spill-capable window plan is the right physical choice;
  *  - the map-side partial's heap table is capped at
  *    `spark.graft.topk.maxBufferedKeys` keys (default 1 << 16): past
  *    the cap, rows of UNSEEN keys pass through unpruned — always
  *    correct (the final pass re-selects exactly), merely less
  *    shuffle-reducing, which is partial aggregation's own degradation
  *    mode under high key cardinality;
  *  - the FINAL pass is sort-based, not hash-based: it requires
  *    child ordering on (partition keys, order spec), so
  *    EnsureRequirements plants a SortExec — which spills — under it,
  *    and the operator itself streams one group at a time holding at
  *    most the current row. The sort's input is already partial-pruned
  *    to ≤ k rows per (map partition, key), a sliver of the original.
  *
  * Opt-in like [[LevenshteinBandRule]]: `GraftExtensions` injects it
  * for `--conf spark.sql.extensions` sessions;
  * `spark.experimental.extraStrategies` adds it to a live session
  * (StrategySpec exercises that path and pins equality with the
  * window form on real data).
  */
object TopKPerKeyStrategy extends SparkStrategy {

  private def maxK: Int = TopKPerKeyConf.intConf("spark.graft.topk.maxK", 1024)

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
            case Some(k) if k >= 1 && k <= maxK =>
              // InferWindowGroupLimit may already sit below the window;
              // this operator subsumes it, so plan over its child — but
              // ONLY when the pruning it performed is provably a
              // superset of ours: same keys and order, a row_number
              // rank (rank/dense_rank keep ties beyond the limit), and
              // a limit at least as large as our k. Anything else keeps
              // the group-limit in place (correct, merely redundant).
              val realChild = w.child match {
                case g: logical.WindowGroupLimit
                  if g.partitionSpec == part && g.orderSpec == order &&
                    g.rankLikeFunction.isInstanceOf[RowNumber] &&
                    g.limit >= k => g.child
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

/** Checked conf reads for the top-k operator: a malformed value must
  * degrade to the DEFAULT with a warning (vanilla window planning and
  * the unpruned pass-through stay available) rather than surface as an
  * opaque NumberFormatException during planning or mid-task. */
private[plans] object TopKPerKeyConf extends org.apache.spark.internal.Logging {
  def intConf(key: String, default: Int): Int = {
    val raw = SQLConf.get.getConfString(key, default.toString)
    try raw.trim.toInt catch {
      case _: NumberFormatException =>
        logWarning(s"ignoring malformed $key='$raw' — using default $default")
        default
    }
  }
}

/** Bounded per-key top-k. `partial = true` runs pre-shuffle with no
  * distribution requirement and emits its survivors unranked, passing
  * rows through unpruned past the buffered-key cap; `partial = false`
  * requires clustering AND ordering on the keys (EnsureRequirements
  * inserts the exchange and a spill-capable sort), then streams each
  * key group emitting its first k rows with the row_number column
  * appended — O(current row) state. */
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

  /** Final pass streams sorted groups; the planted SortExec is the
    * spill path the round-9 advice asked for. Group-prefix direction
    * is arbitrary — Ascending matches what the exchange's sort would
    * pick anyway. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil
    else partitionExprs.map(SortOrder(_, Ascending)) ++ orderSpec

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  private def maxBufferedKeys: Int =
    TopKPerKeyConf.intConf("spark.graft.topk.maxBufferedKeys", 1 << 16)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = orderSpec
    val k = limit
    val rank = rankAttr
    if (partial) {
      val keyCap = maxBufferedKeys
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(partExprs, childOutput)
        val ord: Ordering[InternalRow] = GenerateOrdering.generate(order, childOutput)
        // PriorityQueue dequeues the MAXIMUM per `ord`, i.e. the worst
        // row currently kept — exactly the eviction candidate
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
        new Iterator[InternalRow] {
          // over-the-cap rows stream out IMMEDIATELY (held only between
          // one hasNext/next pair, so no copy and no growth); buffered
          // heap survivors follow once the input is exhausted
          private var passRow: InternalRow = null
          private var tail: Iterator[InternalRow] = null
          def hasNext: Boolean = {
            if (tail != null) return tail.hasNext
            while (passRow == null && it.hasNext) {
              val row = it.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(h) =>
                  if (h.size < k) h.enqueue(row.copy())
                  else if (ord.compare(row, h.head) < 0) {
                    h.dequeue(); h.enqueue(row.copy())
                  }
                case None if heaps.size < keyCap =>
                  val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
                  h.enqueue(row.copy())
                  heaps.put(key.copy(), h)
                case None =>
                  // over the key cap: ship the row unpruned (correct —
                  // the final pass re-selects exactly; this is partial
                  // aggregation's own high-cardinality degradation)
                  passRow = row
              }
            }
            if (passRow != null) true
            else {
              tail = heaps.valuesIterator.flatMap(_.iterator)
              tail.hasNext
            }
          }
          def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            if (tail != null) tail.next()
            else { val r = passRow; passRow = null; r }
          }
        }
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ it =>
        val keyProj = UnsafeProjection.create(partExprs, childOutput)
        val boundOut = childOutput :+ rank
        val outProj = UnsafeProjection.create(boundOut, boundOut)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        // input arrives key-grouped and order-sorted (requiredChild-
        // Ordering): emit the first k rows of each group, ranked
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var pending: InternalRow = null
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val row = it.next()
              val key = keyProj(row)
              if (curKey == null || key != curKey) {
                curKey = key.copy()
                emitted = 0
              }
              if (emitted < k) {
                emitted += 1
                rankRow.update(0, emitted)
                pending = outProj(joined(row, rankRow))
              }
            }
          }
          def hasNext: Boolean = { advance(); pending != null }
          def next(): InternalRow = {
            advance()
            if (pending == null) throw new NoSuchElementException
            val r = pending
            pending = null
            r
          }
        }
      }, preservesPartitioning = true)
    }
  }
}
