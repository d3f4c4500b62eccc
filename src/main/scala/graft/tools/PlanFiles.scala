package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named queries to one file each —
  * the per-query before/after plan artifacts the optimization rounds
  * commit under plans/rNN/. Unlike PlansDump (PLANS.md, sf0.001,
  * local[8]) this runs at the bench scale and config so the plans match
  * the numbers being claimed.
  *
  *   sbt "runMain graft.tools.PlanFiles <outDir> <suffix> [q1,q2,...]"
  *
  * With no query list, dumps every registered query. Env:
  * SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanFiles <outDir> <suffix> [q1,q2,...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val names: Seq[String] =
      if (args.length < 3) graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .config(graft.model.Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), p)
    }
    println(s"[plans] wrote ${names.size} plans to $outDir (*_$suffix.txt)")
    graft.model.Tables.clearCaches(spark)
    spark.stop()
  }
}
