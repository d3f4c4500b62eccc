package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump order: cheapest families first, so a wall-clock kill yields a
    * mostly-full correctness file — relational/event + text are
    * sub-second each at sf0.01; dedup/sim share one-time index builds;
    * multimodal pays the codec pass and runs last. Pure so VerifySpec
    * pins it. */
  private[graft] def dumpOrder(names: Seq[String]): Seq[String] = {
    val familyCost = Map(
      "q" -> 0, "text" -> 1, "pipeline" -> 2, "sim" -> 3,
      "dedup" -> 4, "multimodal" -> 5)
    def family(name: String): String = name.takeWhile(_ != '_')
    // TPC-H-style names (q1_…, q10_…) belong with the cheap relational
    // family, not the unknown-cost tail
    def cost(fam: String): Int =
      if (fam.matches("q\\d+")) 0 else familyCost.getOrElse(fam, 9)
    names.sortBy(n => (cost(family(n)), n))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written BEFORE any query runs: the driver's
    // compare needs it, and a wall-clock kill mid-dump must cost only
    // the queries not yet dumped, never the whole round (round 4's
    // CORRECTNESS artifact was {} because this file was written last
    // and the JVM died first).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // scaled-decade overrides (sf1+): same queries, index-form pair
    // enumeration — used only by tools/scaled_compare.py, never by the
    // driver's sf0.01 gate (which reads oracle_sql.json above)
    val scaledJson = SparkEntry.scaledOracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_scaled.json"), scaledJson)
    // optional subset filter (comma-separated names or prefixes) for
    // targeted local iteration; the driver sets no filter and gets all
    val onlySel: String => Boolean = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .map(pats => (n: String) => pats.exists(p => n == p || n.startsWith(p)))
      .getOrElse((_: String) => true)
    val byName = SparkEntry.queries.filter { case (n, _) => onlySel(n) }
    val ordered = dumpOrder(byName.keys.toSeq).map(n => (n, byName(n)))
    ordered.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(s"[verify] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    graft.model.Tables.clearCaches(spark) // release library-pinned frames/memos
    spark.stop()
  }
}
