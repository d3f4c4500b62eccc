package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the runtime-filter pattern for
  * big-big joins where one side carries a selective filter.
  *
  * At 100 TB a fact-fact join (e.g. lineitem ⨝ filtered orders)
  * shuffles BOTH sides; broadcasting is impossible because the filtered
  * side still has millions of keys. The classic fix is to ship a
  * Bloom filter of the filtered side's join keys to the other side's
  * scan: rows whose key cannot be in the filter are dropped BEFORE the
  * shuffle, cutting exchange volume by the join selectivity at the
  * cost of one tiny (numBits/8 bytes) broadcast. False positives are
  * harmless — the exact join afterwards removes them — so the result
  * is bit-identical to the unpruned join.
  *
  * Spark's own `InjectRuntimeFilter` rule applies the same rewrite
  * automatically when size thresholds are met; this operator is the
  * explicit, always-on form (and uses the engine's Catalyst
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions, so
  * the probe side stays inside WholeStageCodegen).
  *
  * The builder collects ONE row — the serialized filter, whose size is
  * bounded by the `numBits` index parameter, not by data volume (the
  * same bounded-collect argument as the IVF centroid bootstrap,
  * SimilarityQueries.ivfParts).
  */
object BloomPrune {

  /** Serialized Bloom filter over `xxhash64(key)` of every row of
    * `keys` — one distributed aggregate (partial filters merged by OR),
    * one bounded driver row. */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), Literal(expectedItems), Literal(numBits))
    keys.select(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe predicate: true iff `key` MIGHT be in the filter (no false
    * negatives). Pure scalar expression — pushes into the scan stage. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(xxhash64(key))))
}
