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

  test("self-loops and parallel duplicates: filtered from the edge loop, nodes still labeled") {
    // the round-12 invariant: the working edge set starts self-loop- and
    // duplicate-free (an all-self-loop input enters the loop with ZERO
    // edges), but a node whose only edge is a self-loop must still
    // appear in the output as its own component
    val edges = Seq(
      (5L, 5L),                      // self-loop-only node
      (1L, 2L), (2L, 1L), (1L, 2L),  // parallel duplicates both ways
      (7L, 7L), (7L, 8L))            // self-loop on a connected node
      .toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("all-self-loop graph: loop body never runs, every node is its own component") {
    val edges = Seq((3L, 3L), (9L, 9L)).toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 9L -> 9L))
  }

  test("long chain converges (diameter > 2 iterations)") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == 12)
  }

  test("deep diameter: a 1024-node path collapses to one min label (log-depth contraction)") {
    // the adversarial shape for contraction CC: diameter 1023, so a
    // propagation-per-round algorithm needs ~1023 rounds and a
    // doubling one ~10 — the spec both pins correctness on deep
    // graphs and keeps the runtime a regression tripwire (a broken
    // contraction that degenerates to single-step propagation would
    // blow the suite budget immediately)
    val edges = (1L until 1024L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == 1024 && got.forall(_._2 == 1L))
  }

  test("pageRankScaled: star center outranks leaves; symmetric pair ties; matches driver replica") {
    // star {1-2,1-3,1-4} + isolated pair {10,11}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Graph.pageRankScaled(edges).as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L), got)
    assert(got(2L) == got(3L) && got(3L) == got(4L), got)
    assert(got(10L) == got(11L), got)
    // driver-side integer replica of the exact iteration
    val und = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L),
      (10L, 11L), (11L, 10L))
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = und.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 8) {
      val contrib = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = r.keys.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == r, s"engine=$got replica=$r")
  }

  test("∀ random graphs: labels == driver-side union-find") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val graphGen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    val prop = Prop.forAll(graphGen) { edges =>
      edges.isEmpty || {
        val got = Graph.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        // reference union-find on the driver
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
