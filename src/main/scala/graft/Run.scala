package graft
import org.apache.spark.sql.SparkSession

/** Dev runner: execute one registered query and print its row count,
  * wall time, and (with `--explain`) the formatted physical plan —
  * the `.explain`-and-iterate loop the build process relies on.
  *
  * Usage: runMain graft.Run <queryName> [sfDir] [--explain] [--show]
  */
object Run {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    if (pos.isEmpty) {
      System.err.println("usage: runMain graft.Run <queryName> [sfDir] [--explain] [--show]")
      sys.exit(2)
    }
    val name = pos(0)
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; registered: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .config(graft.model.Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (flags("--explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    printf("[run] %s rows=%d t=%.3fs%n", name, n, (System.nanoTime() - t0) / 1e9)
    if (flags("--show")) df.show(20, false)
    graft.model.Tables.clearCaches(spark)
    spark.stop()
  }
}
