package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.Tables

/** BPE-training cost-structure measurement
  * (`runMain graft.tools.BpeBench`): the registered `text_bpe_train`
  * proves SIX learn→re-encode→re-count rounds oracle-exactly; the cost
  * claim behind it — "one full corpus pass per merge round, so wall is
  * linear in the merge budget" — deserves a measurement at a realistic
  * budget, not an extrapolation. This times
  * [[graft.queries.TextQueries.bpeTrain]] at a list of merge budgets
  * (default 6 and 24) on the `SPARK_GRAFT_SF_DIR` corpus and reports
  * per-budget wall plus the MARGINAL seconds/round between consecutive
  * budgets — flat marginal cost is the linearity claim made
  * measurable. Warm = best of two runs, same policy as [[graft.Bench]].
  *
  * One JSON line on stdout; not an artifact of record by itself — the
  * numbers land in SCALING.md's BPE section.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val budgets = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "6,24")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf, "true")
      .config(Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def once(rounds: Int): Double = {
      val t0 = System.nanoTime()
      graft.queries.TextQueries.bpeTrain(spark, sfDir, rounds).count()
      (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    val warm = budgets.map(r => r -> math.min(once(r), once(r)))
    val marginal = warm.sliding(2).collect {
      case Seq((r1, t1), (r2, t2)) if r2 > r1 =>
        s""""rounds_${r1}_to_$r2":${f3((t2 - t1) / (r2 - r1))}"""
    }.mkString("{", ",", "}")
    val per = warm.map { case (r, t) =>
      s""""rounds_$r":{"sec":${f3(t)},"sec_per_round":${f3(t / r)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"bpe_train","budgets":$per,"marginal_sec_per_round":$marginal,"sf":"$sfDir","method":"bpeTrain(rounds) warm best-of-2; marginal = (t2-t1)/(r2-r1) between consecutive budgets — flat marginal cost is the one-corpus-pass-per-round claim"}""")
    spark.stop()
  }
}
