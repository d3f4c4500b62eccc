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
    * edge, rep = min node id of its connected component. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    // materialize the (possibly expensive) edge lineage once: the union
    // below scans it from two branches, and each round scans it again
    val e = edges.select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
    val nEdges = e.count()
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
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      // each round's frame is eagerly localCheckpoint'ed, NOT persisted:
      // persist keeps execution warm but the LOGICAL plan still chains
      // every previous round, so Catalyst re-analyzes/re-optimizes a
      // tree that grows per iteration and planning time dominates (the
      // round-2 bench measured ~2.5 s/round on a 256-edge graph, almost
      // all of it driver-side planning). Checkpointing truncates the
      // lineage to a LogicalRDD, making per-round planning cost CONSTANT
      // — the standard discipline for iterative Spark jobs. The
      // checkpoint blocks are |V|-row frames; each round's goes out of
      // scope immediately and the ContextCleaner drops it.
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("rep", col("node"))
        .localCheckpoint(true)
      var converged = false
      while (!converged) {
        // neighbor messages + a self-tagged copy of the labels: one
        // min-aggregate computes the new label AND carries the old one
        val msgs = sym
          .join(labels.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("rep"), lit(false).as("self"))
        val combined = labels
          .select(col("node"), col("rep"), lit(true).as("self"))
          .unionByName(msgs)
          .groupBy("node")
          .agg(min("rep").as("rep"), min(when(col("self"), col("rep"))).as("old"))
        // pointer jumping: rep := rep's rep — doubles propagation reach
        // per round, so convergence is O(log diameter) instead of
        // O(diameter). The two scans of `combined` share their shuffle
        // via ReuseExchange.
        val reps = combined.select(col("node").as("rep"), col("rep").as("rep2"))
        val next = combined
          .join(reps, Seq("rep"), "left")
          .select(col("node"), col("old"),
            least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"))
          .localCheckpoint(true) // one materializing action per round
        // convergence count scans the just-checkpointed rows only
        val shrunk = next.filter(col("rep") < col("old")).count()
        labels = next
        converged = shrunk == 0
      }
      labels.select(col("node"), col("rep"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      e.unpersist()
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
