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
  * no label shrinks. Iteration count is the graph diameter — near-dup
  * components are tiny (pairs/chains), so 2–3 rounds in practice; for
  * adversarial diameters at corpus scale, swap in path-doubling
  * (large-star/small-star) on the same DataFrame shape.
  *
  * The driver-side loop only checks a scalar convergence count per
  * round — data never leaves the executors.
  */
object Graph {

  /** edges(doc_a, doc_b) → (node, rep) for every node appearing in an
    * edge, rep = min node id of its connected component. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("rep", col("node"))
      .persist()
    var converged = false
    while (!converged) {
      val prop = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("rep").as("nrep"))
      val viaNeighbors = labels
        .join(prop, Seq("node"), "left")
        .select(col("node"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // pointer jumping: rep := rep's rep — doubles propagation reach per
      // round, so convergence is O(log diameter) instead of O(diameter)
      val reps = viaNeighbors.select(col("node").as("rep"), col("rep").as("rep2"))
      val next = viaNeighbors
        .join(reps, Seq("rep"), "left")
        .select(col("node"), least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"))
        .persist()
      val shrunk = next.join(labels.withColumnRenamed("rep", "old"), "node")
        .filter(col("rep") < col("old")).count()
      labels.unpersist()
      labels = next
      converged = shrunk == 0
    }
    sym.unpersist()
    labels
  }
}
