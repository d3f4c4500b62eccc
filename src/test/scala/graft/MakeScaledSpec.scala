package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.tools.MakeScaled

/** Pins the invariants SCALING.md's sf1 measurement rests on: copy 0
  * is the base data unchanged, key shifts cannot collide, and the
  * similarity structure is preserved WITHIN a copy while copies stay
  * disjoint (tokens) / decorrelated (embeddings) ACROSS copies — the
  * property that makes a scaled run measure the engine's asymptotics
  * instead of generator-created duplicate blowup.
  */
class MakeScaledSpec extends SparkSpec {
  import spark.implicits._

  test("documents: copy 0 identity, shifted ids collision-free, cross-copy tokens disjoint") {
    val docs = Tables.load(spark, sf0001, "documents")
    val n = docs.count()
    val scaled = MakeScaled.scaleTable("documents", docs, factor = 3)
    assert(scaled.count() == 3 * n)
    assert(scaled.select("doc_id").distinct().count() == 3 * n)
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    // copy 0 rides through byte-for-byte
    assert(scaled.filter($"doc_id" <= maxId).exceptAll(docs).isEmpty)
    // cross-copy token sets are disjoint (copy c prefixes every token)
    val tok = scaled
      .withColumn("copy", floor($"doc_id" / (maxId + 1)))
      .select($"copy", explode(split($"text", " ")).as("t"))
      .groupBy("t").agg(countDistinct($"copy").as("nc"))
    assert(tok.filter($"nc" > 1).count() == 0,
      "a token appearing in two copies would create cross-copy near-dups")
    // n_chars stays consistent with the rewritten text
    assert(scaled.filter(length($"text").cast("long") =!= $"n_chars").count() == 0)
  }

  test("embeddings: rotation preserves within-copy dot products (up to fold order), ids shift cleanly") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val n = emb.count()
    val scaled = MakeScaled.scaleTable("embeddings", emb, factor = 2)
    assert(scaled.count() == 2 * n)
    val maxId = emb.agg(max($"vec_id")).head.getLong(0)
    // the rotation permutes the product terms, so the IEEE fold can
    // differ in the last ulp — the SET of products (and so the cosine
    // structure) is what the scaling corpus preserves
    import graft.functions.KernelExpressions.dot
    def pairDots(df: org.apache.spark.sql.DataFrame, shift: Long) = {
      val v = df.select(($"vec_id" - shift).as("id"),
        transform($"embedding", x => x.cast("double")).as("v"))
      v.filter($"id" < 8).as("a").join(v.filter($"id" < 8).as("b"),
          col("a.id") < col("b.id"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"),
          dot(col("a.v"), col("b.v")).as("d"))
        .as[(Long, Long, Double)].collect()
        .map { case (ia, ib, d) => ((ia, ib), d) }.toMap
    }
    val base = pairDots(scaled.filter($"vec_id" <= maxId), 0L)
    val copy1 = pairDots(scaled.filter($"vec_id" > maxId), maxId + 1)
    assert(base.nonEmpty && base.keySet == copy1.keySet)
    base.foreach { case (k, d) =>
      assert(math.abs(d - copy1(k)) <= 1e-12 * math.max(1.0, math.abs(d)),
        s"pair $k: $d != ${copy1(k)}")
    }
  }

  test("lineitem/orders: referential integrity holds per copy") {
    val orders = Tables.load(spark, sf0001, "orders")
    val li = Tables.load(spark, sf0001, "lineitem")
    val so = MakeScaled.scaleTable("orders", orders, factor = 2)
    val sl = MakeScaled.scaleTable("lineitem", li, factor = 2)
    // every scaled lineitem still finds exactly its order
    val dangling = sl.join(so, sl("l_orderkey") === so("o_orderkey"), "left_anti")
    assert(dangling.count() == 0)
    // and the join carries exactly 2x the base matches
    val baseMatches = li.join(orders, li("l_orderkey") === orders("o_orderkey")).count()
    val scaledMatches = sl.join(so, sl("l_orderkey") === so("o_orderkey")).count()
    assert(scaledMatches == 2 * baseMatches)
  }
}
