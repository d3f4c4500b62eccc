package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Optimization-round profiler: per-query wall time plus a Spark-job
  * breakdown (duration, stage/task counts) so cold cost can be
  * attributed to the substrate build that actually pays it. Mirrors
  * Bench's session config and family order; writes a plain-text report.
  *
  *   sbt "runMain graft.tools.ProfileQueries [prefix,prefix,...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_PROFILE_OUT (default /tmp/profile_queries.out).
  * Diagnostic tool only — not part of the driver contract.
  */
object ProfileQueries {
  private case class J(id: Int, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0,
      var runMs: Long = 0L, var gcMs: Long = 0L, var cpuMs: Long = 0L,
      var deserMs: Long = 0L, var stageIds: Set[Int] = Set.empty)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT", "/tmp/profile_queries.out")
    val sel: String => Boolean =
      if (args.isEmpty) _ => true
      else { val pats = args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSeq
        (n: String) => pats.exists(p => n == p || n.startsWith(p)) }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .config(graft.model.Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val jobs = new ArrayBuffer[J]()
    val byId = new scala.collection.mutable.HashMap[Int, J]()
    val stageToJob = new scala.collection.mutable.HashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId, e.time, stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum,
          stageIds = e.stageInfos.map(_.stageId).toSet)
        jobs += j; byId(e.jobId) = j
        e.stageInfos.foreach(si => stageToJob(si.stageId) = j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        byId.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        val m = e.taskMetrics
        if (m != null) stageToJob.get(e.stageId).foreach { j =>
          j.runMs += m.executorRunTime
          j.gcMs += m.jvmGCTime
          j.cpuMs += m.executorCpuTime / 1000000L
          j.deserMs += m.executorDeserializeTime
        }
      }
    })

    val out = new java.io.PrintWriter(outPath)
    val familyOrder = Seq("dedup", "pipeline", "sim", "multimodal", "q", "text")
    def family(name: String): String = name.takeWhile(_ != '_')
    val byFamily = graft.SparkEntry.queries.toSeq.filter(q => sel(q._1))
      .sortBy(_._1).groupBy(q => family(q._1))
    val ordered = (familyOrder.filter(byFamily.contains) ++
      byFamily.keys.toSeq.filterNot(familyOrder.contains).sorted)
      .flatMap(byFamily(_))

    for ((name, fn) <- ordered) {
      jobs.synchronized { jobs.clear(); byId.clear() }
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch {
        case e: Throwable => out.println(s"== $name FAILED: ${e.getMessage}"); -1L
      }
      val cold = (System.nanoTime() - t0) / 1e9
      if (n >= 0) {
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        out.println(f"== $name%-44s cold=$cold%8.3f warm=$warm%8.3f rows=$n")
        jobs.synchronized {
          val done = jobs.filter(_.t1 > 0)
          out.println(f"   coldjobs=${done.size} jobtime=${done.map(j => j.t1 - j.t0).sum / 1000.0}%.2f")
          done.sortBy(j => -(j.t1 - j.t0)).take(10).foreach { j =>
            out.println(f"   ${(j.t1 - j.t0) / 1000.0}%7.2f s  stages=${j.stages}%3d tasks=${j.tasks}%5d run=${j.runMs / 1000.0}%7.2f cpu=${j.cpuMs / 1000.0}%7.2f gc=${j.gcMs / 1000.0}%6.2f deser=${j.deserMs / 1000.0}%6.2f")
          }
        }
      }
      out.flush()
    }
    out.close()
    println(s"[profile] wrote $outPath")
    graft.model.Tables.clearCaches(spark)
    spark.stop()
  }
}
