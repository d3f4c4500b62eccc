package graft

import org.apache.spark.sql.expressions.Window

/** The custom planner strategy (graft.plans.TopKPerKeyStrategy) must
  * produce EXACTLY the window-rank-filter's rows — rank column
  * included — while planning a partial+final bounded-heap pair
  * instead of a WindowExec. Equality is checked on real data with a
  * TOTAL order (so row_number is well-defined on both paths), the
  * plan shape is pinned, and the fall-through guard is exercised.
  */
class StrategySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def events = graft.model.Tables.load(spark, sf0001, "events")
    .select($"user_id", $"event_type", $"value", $"event_id")

  private def topkQuery = events
    .withColumn("rn", row_number().over(
      Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")))
    .filter($"rn" <= 5)

  private def withStrategy[A](body: => A): A = {
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = saved :+ graft.plans.TopKPerKeyStrategy
    try body finally spark.experimental.extraStrategies = saved
  }

  test("rank-filter plans as partial+final TopKPerKeyExec — no WindowExec, heap before the shuffle") {
    withStrategy {
      val q = topkQuery
      val p = q.queryExecution.executedPlan.toString
      assert(p.split("TopKPerKey").length - 1 == 2, p) // partial + final
      assert(!p.contains("Window"), p)
      // the partial pass sits BELOW the exchange: at most k rows per
      // (map partition, key) are shuffled
      val belowExchange = p.substring(p.indexOf("Exchange"))
      assert(belowExchange.contains("TopKPerKey"), p)
      assert(q.count() > 0)
    }
  }

  test("strategy output == window form, rank values included, on a total order") {
    val want = topkQuery.collect().map(_.toSeq).toSet // vanilla planning
    val got = withStrategy {
      val q = topkQuery
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      q.collect().map(_.toSeq).toSet
    }
    assert(got == want && want.nonEmpty)
    // every key capped at 5 with ranks 1..5
    val byKey = got.toSeq.groupBy(_(1))
    assert(byKey.values.forall(rows => rows.size <= 5 &&
      rows.map(_.last).toSet == (1 to rows.size).map(i => i: Any).toSet))
  }

  test("memory rails: k over spark.graft.topk.maxK falls through to vanilla planning") {
    withStrategy {
      spark.conf.set("spark.graft.topk.maxK", "3")
      try {
        val q = topkQuery // k = 5 > 3 → per-key state deemed too big; let WindowExec spill
        assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(q.count() > 0)
      } finally spark.conf.unset("spark.graft.topk.maxK")
    }
  }

  test("memory rails: a 1-key buffered cap still yields exact rows via pass-through") {
    val want = topkQuery.collect().map(_.toSeq).toSet // vanilla planning
    val got = withStrategy {
      spark.conf.set("spark.graft.topk.maxBufferedKeys", "1")
      try {
        val q = topkQuery
        assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        q.collect().map(_.toSeq).toSet
      } finally spark.conf.unset("spark.graft.topk.maxBufferedKeys")
    }
    assert(got == want && want.nonEmpty)
  }

  test("memory rails: malformed conf values degrade to defaults, never throw mid-planning") {
    val want = topkQuery.collect().map(_.toSeq).toSet // vanilla planning
    val got = withStrategy {
      spark.conf.set("spark.graft.topk.maxK", "not-a-number")
      spark.conf.set("spark.graft.topk.maxBufferedKeys", "1e6") // floats are malformed too
      try {
        val q = topkQuery
        // defaults apply: k=5 ≤ 1024, so the operator still plans
        assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        q.collect().map(_.toSeq).toSet
      } finally {
        spark.conf.unset("spark.graft.topk.maxK")
        spark.conf.unset("spark.graft.topk.maxBufferedKeys")
      }
    }
    assert(got == want && want.nonEmpty)
  }

  test("guards: rank() or extra conjuncts fall through to Spark's own planning") {
    withStrategy {
      val rk = events
        .withColumn("rn", rank().over(
          Window.partitionBy($"event_type").orderBy($"value".desc)))
        .filter($"rn" <= 5)
      assert(!rk.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val conj = topkQuery.filter($"value" > 0)
      // Filter(value > 0 && rn <= 5) is not the bare rank bound; the
      // optimizer may or may not keep them in one Filter node — either
      // way results must be right, which the vanilla path guarantees
      assert(conj.collect().forall(_.getAs[Double]("value") > 0))
    }
  }
}
