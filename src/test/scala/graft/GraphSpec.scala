package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, pair, and triangle collapse to min label") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (diameter > 2 iterations)") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == 12)
  }
}
