package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph connectivity for dedup survivor selection.
  *
  * Near-duplicate pairs form an undirected graph; the canonical
  * training-data dedup policy keeps one document per connected
  * component (the minimum doc id). Label propagation to fixpoint:
  * every node starts labeled with itself; each round, nodes adopt the
  * minimum label among themselves and their neighbors; converged when
  * no label shrinks. Pointer jumping (rep := rep's rep) doubles
  * propagation reach per round, so convergence is O(log diameter);
  * near-dup components are tiny (pairs/chains), so 2–3 rounds in
  * practice.
  *
  * Cost discipline (the round-1 bench lesson — dedup_survivors was
  * 2.3× its baseline, almost all of it fixed scheduling overhead):
  *  - the input edge lineage (an expensive similarity join) is
  *    persisted and materialized ONCE before the symmetrizing union
  *    scans it from two branches;
  *  - iteration shuffles are sized to the GRAPH, not to the session
  *    default: the pair graph is orders of magnitude smaller than the
  *    corpus (a 500-node graph sharded 32 ways pays ~10 stage/codegen
  *    overheads per round for ~15 rows per task). The session's
  *    shuffle-partition conf is scoped down to ~1M edges/partition for
  *    the duration of the loop and restored after — the same sizing
  *    AQE would converge to, but applied up front so every round
  *    benefits. The loop is synchronous, so the scoped conf cannot
  *    leak into concurrent queries from this call;
  *  - each round runs TWO joins: neighbor messages union a self-tagged
  *    copy of the labels, so one min-aggregate yields both the new
  *    label and the old one (for the convergence count) — no separate
  *    old-label join;
  *  - each round ends in an eager localCheckpoint, so per-round
  *    PLANNING cost is constant: a persisted frame keeps execution
  *    warm but its logical plan still chains every earlier round, and
  *    Catalyst re-analysis of that growing tree dominated the round-2
  *    wall clock. The result frame is likewise checkpoint-detached, so
  *    the caller gets a self-contained frame; intermediate checkpoint
  *    blocks (|V|-row frames) are dropped by the ContextCleaner as
  *    each round's reference goes out of scope.
  *
  * The driver-side loop only sees a scalar count per round — data
  * never leaves the executors.
  */
object Graph {

  /** edges(doc_a, doc_b) → (node, rep) for every node appearing in an
    * edge, rep = min node id of its connected component.
    *
    * Label propagation with pointer jumping over a CONTRACTING edge
    * set — both halves matter:
    *
    *  - the ACCUMULATED label map is what makes rounds O(log d): each
    *    round folds min-of-neighbor-labels into the map and then
    *    jumps through the map itself (rep := rep's rep), so the
    *    distance each label has travelled DOUBLES per round (the
    *    reach recurrence is f ← 2f+2). A formulation that rebuilds
    *    representatives from scratch per round — min over immediate
    *    neighbors plus one jump — moves labels only two hops per
    *    round and needs Θ(diameter) rounds on a path (caught by
    *    GraphSpec's 1024-node-path test when this function briefly
    *    shipped that way);
    *  - the MESSAGE edges are relabeled under the current map after
    *    every round (self-loops dropped, parallel edges merged), so
    *    the per-round neighbor-min runs on a frame that shrinks as
    *    components merge. Near-dup graphs (tiny diameter, fat
    *    components) collapse almost entirely in the first round, so
    *    total edge work is ~one full pass plus vanishing tails —
    *    plain propagation rescanned all of E every round, which the
    *    round-10 ×100 probe measured as 8.8× wall growth on the
    *    mutual-kNN graph. On a worst-case path the contracted set
    *    thins by the travelled distance per round, so the bound
    *    degrades gracefully to the old O(E log d), never worse.
    *
    * The fixpoint is algorithm-independent (rep = min member id: the
    * minimum's own label can never decrease below itself, and the
    * loop exits only when every edge's endpoints share a label), so
    * callers and the recursive-CTE oracles see identical labels. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    // materialize the (possibly expensive) edge lineage once: the union
    // below scans it from two branches
    val e0 = edges.select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
    val nEdges = e0.count()
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val parts = math.max(1L, math.min(prevParts.toLong, nEdges / 1000000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // every round plans NEW operators (the cache references change), so
    // whole-stage codegen recompiles ~10 janino units per round — seconds
    // of fixed cost that only pays for itself on a big graph. Below ~10M
    // edges interpreted execution of a few thousand rows is far cheaper
    // than the compiles; above it, codegen stays on and amortizes.
    if (nEdges < 10000000L) spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      // each round's frames are eagerly localCheckpoint'ed, NOT
      // persisted: persist keeps execution warm but the LOGICAL plan
      // still chains every previous round, so Catalyst re-analyzes a
      // tree that grows per iteration and planning time dominates (the
      // round-2 bench measured ~2.5 s/round on a 256-edge graph, almost
      // all of it driver-side planning). Checkpointing truncates the
      // lineage to a LogicalRDD, making per-round planning cost
      // CONSTANT. Intermediate checkpoint blocks go out of scope each
      // round and the ContextCleaner drops them.
      val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      // accumulated mapping original node → current label; |V| rows,
      // refreshed (not rebuilt) every round. Built from the UNFILTERED
      // symmetric set: a node whose only edge is a self-loop is its own
      // component and must still appear in the output.
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("rep", col("node"))
        .localCheckpoint(true)
      // the working edge set starts on the loop invariant (no
      // self-loops, no parallel duplicates) so round 1's neighbor-min
      // and contraction never scan edges the algorithm can't use
      var e = sym.filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true)
      while (!e.isEmpty) {
        // (1) neighbor-min over the CONTRACTED edges: both endpoints
        // are current labels, so min(dst) per src is the best
        // neighboring label
        val minNbr = e.groupBy("src").agg(min("dst").as("mnb"))
          .select(col("src").as("rep"), col("mnb"))
        // (2) fold into the accumulated map (nodes whose current rep
        // got a better neighbor adopt it)…
        val lab1 = labels.join(minNbr, Seq("rep"), "left")
          .select(col("node"), least(col("rep"), coalesce(col("mnb"), col("rep"))).as("rep"))
          .persist() // two consumers below; lineage is short (from checkpointed frames)
        // (3) …then pointer-jump THROUGH the map: rep := rep's rep.
        // Labels only ever decrease, so the chain is acyclic; because
        // the map accumulates across rounds, the jump doubles the
        // travelled distance (this, not the neighbor-min, is the
        // log-depth engine).
        val reps = lab1.select(col("node").as("rep"), col("rep").as("rep2"))
        val next = lab1.join(reps, Seq("rep"), "left")
          .select(col("node"),
            least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"))
          .localCheckpoint(true)
        // (4) contract: relabel both endpoints under the refreshed
        // map, drop self-loops, merge parallel edges. e is symmetric
        // and relabeling preserves symmetry, so no re-union is needed.
        e = e
          .join(next.select(col("node").as("src"), col("rep").as("rsrc")), "src")
          .join(next.select(col("node").as("dst"), col("rep").as("rdst")), "dst")
          .select(col("rsrc").as("src"), col("rdst").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint(true)
        lab1.unpersist()
        labels = next
      }
      // FLATTEN the label forest to its roots. Contraction can drop an
      // edge as a self-loop through the LABEL-VALUE node's chain while
      // some members of the class still carry an earlier label (the
      // label-value node may advance further than its class in the
      // same round) — the connectivity is not lost, it lives in the
      // map itself: member → old label → … → root. Labels form a
      // strictly decreasing forest (rep(n) ≤ n), so jumping the map
      // through itself to fixpoint resolves every chain to its root =
      // the component minimum (the min is always self-labeled; an
      // edge only ever drops when both endpoint chains meet).
      // Doubling per jump ⇒ O(log chain) rounds of |V|-row joins, no
      // edge data touched; chains are 1–2 links on real graphs.
      var flat = false
      while (!flat) {
        val reps = labels.select(col("node").as("rep"), col("rep").as("rep2"))
        val nxt = labels.join(reps, Seq("rep"), "left")
          .select(col("node"),
            least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"),
            (col("rep2") < col("rep")).as("moved"))
          .localCheckpoint(true)
        flat = nxt.filter(col("moved")).isEmpty
        labels = nxt.select(col("node"), col("rep"))
      }
      labels.select(col("node"), col("rep"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      e0.unpersist()
    }
  }

  /** Scaled-integer PageRank over the undirected pair graph — the
    * centrality signal behind canonical selection within a duplicate
    * cluster (keep the most-connected member, not the smallest id).
    *
    * Engine-exact by construction: ranks are 10⁶-scaled longs, the
    * damping step is `150000 + (85 · Σ(r div deg)) div 100` in pure
    * integer arithmetic, and integer sums are order-independent — so
    * the DuckDB oracle reproduces every iteration bit-for-bit, where a
    * floating formulation would drift with summation order. Fixed
    * `iters` rounds (near-dup components are tiny, diameter ≪ 8, so
    * ranks are stationary well before the cap) keeps the oracle a
    * finite CTE chain.
    *
    * Same cost discipline as [[connectedComponents]]: edge lineage
    * materialized once, shuffles sized to the graph, each round
    * truncated with an eager localCheckpoint so planning cost stays
    * constant. Returns (doc_id, r) for every node with an edge.
    */
  def pageRankScaled(edges: DataFrame, iters: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
    val nEdges = e.count()
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val parts = math.max(1L, math.min(prevParts.toLong, nEdges / 1000000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    if (nEdges < 10000000L) spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      // (src, dst, deg) — the per-round join input, graph-sized
      val undD = und.join(deg, "src").localCheckpoint(true)
      var r = und.select(col("src").as("doc_id")).distinct()
        .withColumn("r", lit(1000000L))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        val contrib = undD
          .join(r.withColumnRenamed("doc_id", "src"), Seq("src"))
          .select(col("dst").as("doc_id"), expr("r div deg").as("c"))
          .groupBy("doc_id").agg(sum(col("c")).as("sc"))
        r = r.select("doc_id")
          .join(contrib, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (lit(150000L) + expr("(85L * coalesce(sc, 0L)) div 100L")).as("r"))
          .localCheckpoint(true)
      }
      r
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      e.unpersist()
    }
  }
}
