package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.BloomPrune

/** Behavioral contract of the Bloom semi-join prune: never a false
  * negative (a pruned row that the join needed), and the pruned join's
  * result is identical to the unpruned one.
  */
class BloomPruneSpec extends SparkSpec {

  test("every true key passes the probe — no false negatives") {
    val ord = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomPrune.bloomOf(ord, col("o_orderkey"), 10000L, 80000L)
    val missed = ord.filter(!BloomPrune.mightContain(bloom, col("o_orderkey"))).count()
    assert(missed === 0L)
  }

  test("pruned join result equals the unpruned join") {
    val ord = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.load(spark, sf0001, "lineitem")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bloom = BloomPrune.bloomOf(ord, col("o_orderkey"), 10000L, 80000L)
    val pruned = li.filter(BloomPrune.mightContain(bloom, col("l_orderkey")))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned === plain)
  }

  test("the probe actually prunes non-matching rows at this filter size") {
    val ord = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.load(spark, sf0001, "lineitem")
    val bloom = BloomPrune.bloomOf(ord, col("o_orderkey"), 10000L, 80000L)
    val kept = li.filter(BloomPrune.mightContain(bloom, col("l_orderkey"))).count()
    val total = li.count()
    // urgent orders are ~1/5 of the table; with 8 bits/item the false
    // positive rate is ~2%, so the probe must drop well over half
    assert(kept < total * 6 / 10, s"kept $kept of $total — bloom not pruning")
  }
}
