package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark for graft.plans.TopKPerKeyStrategy: the same
  * per-key top-k (top 5 events per (user, type) by value) on the
  * bench corpus, planned as WindowExec (vanilla) vs the partial+final
  * bounded-heap pair (strategy). Prints one JSON line with best-of-3
  * warm times per path and the row counts (which must match).
  *
  * `sbt "runMain graft.tools.StrategyBench [sfDir]"`
  */
object StrategyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .config(graft.model.Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"value", $"event_id")
    // many cold keys (per-user) vs few HOT keys (per-type): the hot
    // shape is where the bounded heap pays — the window form shuffles
    // and sorts EVERY row of each hot key on one reducer, the heap
    // form shuffles ≤ k rows per (map partition, key)
    def qUser = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"event_type")
          .orderBy($"value".desc, $"event_id")))
      .filter($"rn" <= 5)
    def qHot = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")))
      .filter($"rn" <= 5)

    def bestOf3(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var best = Double.MaxValue; var n = -1L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        n = mk.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    qUser.count() // warm the scan cache for both paths
    val (tWinUser, nWinUser) = bestOf3(qUser)
    val (tWinHot, nWinHot) = bestOf3(qHot)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    require(qUser.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "strategy did not fire")
    val (tTopUser, nTopUser) = bestOf3(qUser)
    val (tTopHot, nTopHot) = bestOf3(qHot)
    require(nWinUser == nTopUser && nWinHot == nTopHot,
      s"row mismatch: $nWinUser/$nTopUser $nWinHot/$nTopHot")

    println(f"""{"metric":"topk_strategy","sf":"$sfDir","per_user":{"rows":$nTopUser,"window_sec":$tWinUser%.3f,"topk_sec":$tTopUser%.3f,"speedup":${tWinUser / tTopUser}%.2f},"hot_keys":{"rows":$nTopHot,"window_sec":$tWinHot%.3f,"topk_sec":$tTopHot%.3f,"speedup":${tWinHot / tTopHot}%.2f}}""")
    spark.stop()
  }
}
