package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (JVM/codegen/FS init) so the first timed query
    // isn't charged for it; the flagship on sf0.001 is sub-second
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // deterministic name order (Map iteration order is hash-based);
    // alphabetical also means warm-up of shared cached frames (shingle
    // index, vectors) lands on the first query of each family
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-2 per query: a GC pause or JIT recompile on a single run
    // cannot masquerade as a real regression; the spread between runs is
    // reported so reviewers can judge measurement noise
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed query must NOT masquerade as a fast success: record -1
      val times = try Seq(once(fn), once(fn)) catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); Seq(-1.0)
      }
      (name, times.min, if (times.size > 1) times.max - times.min else 0.0)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // any failure poisons the total: a broken run must never look fast
    val total =
      if (results.exists(_._2 < 0)) -1.0
      else if (results.nonEmpty) results.map(_._2).sum
      else 0.0
    val spread = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","run_policy":"best_of_2","spread_sum_sec":$spread}""")
    graft.model.Tables.clearCaches(spark) // release library-pinned frames/memos
    spark.stop()
  }
}
