package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query and total timings.
  *
  * Measurement policy (BASELINE.md quotes this):
  *  - every query runs twice; `queries_cold` is the FIRST run,
  *    `queries` is the best of two (the steady-state figure, immune to
  *    one GC pause / JIT recompile);
  *  - the headline `value` is the COLD total: queries run in family
  *    order, so each one-time shared cost (the shingle index, the
  *    normalized-vector cache, the memoized connected-components
  *    labels) is paid by exactly one first run and appears in the
  *    total exactly once — nothing is hidden by a warm cache, and
  *    nothing is double-charged. `total_warm` is the best-of-2 sum,
  *    comparable to rounds 1–2;
  *  - cached frames are family-scoped: the dedup → pipeline → sim
  *    families legitimately share plan-cached frames (shingles, pair
  *    graph, vectors), so they run first as one block, then ALL caches
  *    are released before the relational/text/multimodal families —
  *    a pinned shingle index must not squeeze execution memory for an
  *    unrelated TPC-H join (the round-2 bench regression).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches BASELINE.md's measurement config (local[32], 32
    // shuffle partitions); override via SPARK_GRAFT_CPUS for smaller boxes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (JVM/codegen/FS init) so the first timed query
    // isn't charged for it; the flagship on sf0.001 is sub-second
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // family order: the cache-sharing block (dedup/pipeline/sim) first,
    // then families that pin nothing; alphabetical inside a family
    val familyOrder = Seq("dedup", "pipeline", "sim", "multimodal", "q", "text")
    def family(name: String): String = name.takeWhile(_ != '_')
    val byFamily = SparkEntry.queries.toSeq.sortBy(_._1).groupBy(q => family(q._1))
    val orderedFamilies =
      familyOrder.filter(byFamily.contains) ++
        byFamily.keys.toSeq.filterNot(familyOrder.contains).sorted
    val sharedCacheFamilies = Set("dedup", "pipeline", "sim")

    val results = orderedFamilies.flatMap { fam =>
      val rows = byFamily(fam).map { case (name, fn) =>
        // a failed query must NOT masquerade as a fast success: record -1
        val times = try Seq(once(fn), once(fn)) catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); Seq(-1.0)
        }
        (name, times.head, times.min)
      }
      // release pinned frames once the last family of the sharing block
      // (or any isolated family) is done — later families start unpinned
      if (!sharedCacheFamilies.contains(fam) || fam == "sim")
        graft.model.Tables.clearCaches(spark)
      rows
    }

    def jsonMap(sel: ((String, Double, Double)) => Double): String =
      results.map { case r @ (k, _, _) => "\"" + k + "\":" + sel(r) }
        .mkString("{", ",", "}")
    // any failure poisons the totals: a broken run must never look fast
    val failed = results.exists(_._3 < 0)
    val totalCold = if (failed) -1.0 else results.map(_._2).sum
    val totalWarm = if (failed) -1.0 else results.map(_._3).sum
    println(s"""{"metric":"total","value":$totalCold,"unit":"sec""""
      + s""","queries":${jsonMap(_._3)},"queries_cold":${jsonMap(_._2)}"""
      + s""","total_warm":$totalWarm,"sf":"$sfDir""""
      + s""","run_policy":"value=cold total (each one-time shared cost paid exactly once, in family order); queries=best-of-2 steady state; caches released after the dedup/pipeline/sim block"}""")
    graft.model.Tables.clearCaches(spark) // release library-pinned frames/memos
    spark.stop()
  }
}
