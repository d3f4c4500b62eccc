package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.Ingest
import graft.ops.Windows
import graft.sources.Sources
import graft.streaming.{StreamingJobs, UpsertSink}

/** Demo entry point with the reference's job-dispatch contract
  * (reference Starter.java:31–42: a `JOB_CLASS_NAME` property selects
  * one of the stream jobs; `INTERVAL_AMOUNT`/`INTERVAL_UOM` size the
  * window — StreamJobSqlTumbling.java:86–88).
  *
  * The one-line swap to the real front door: pass
  * `--source kinesis:<streamName>:<region>[:<initpos>]` and put the
  * awslabs `spark-streaming-sql-kinesis-connector` jar on the
  * classpath — [[Sources.kinesis]] already emits its option schema.
  * This container has no connector jar and zero egress, so the demo
  * (and DemoSpec) runs the file stand-in `--source dir:<path>`, whose
  * records reach the job as the same raw strings a Kinesis record
  * would ([[Sources.geojsonLinesDir]]).
  *
  * Jobs (1:1 with the reference classes):
  *  - `StreamJobSqlTumbling` / `StreamJobTumbling` — tumbling count
  *    (the Table-API job maps onto the same plan, W4);
  *  - `StreamJobSqlHopping` — hopping count (the reference hard-codes
  *    slide 0, degenerate in Flink and rejected by Spark; the demo
  *    uses slide = size/2 as the intended semantics, SURVEY.md §7.3);
  *  - `StreamJobTumblingOffset` — tumbling with alignment offset;
  *  - `StreamJobSqlSliding` / `StreamJobSingle` — per-row trailing
  *    COUNT(*) OVER RANGE (30-minute frame in StreamJobSingle.java:152),
  *    via the stateful streaming OVER operator.
  */
object StarterDemo {

  /** Dispatch table — the Spark form of Starter.java's switch. Builds
    * the transformed stream from raw string records; pure, so tests
    * drive it with any source. */
  def buildJob(jobName: String, raw: DataFrame, interval: String,
      offset: String = "15 seconds"): DataFrame = {
    val parsed = Ingest.withEventTime(Ingest.parseGeoJson(raw), "received_on")
    jobName match {
      case "StreamJobSqlTumbling" | "StreamJobTumbling" =>
        Windows.tumblingCount(parsed, col("received_on"), col("railway_class"), interval)
      case "StreamJobSqlHopping" =>
        Windows.hoppingCount(parsed, col("received_on"), col("railway_class"),
          interval, halfOf(interval))
      case "StreamJobTumblingOffset" =>
        Windows.tumblingOffsetCount(parsed, col("received_on"), col("railway_class"),
          interval, offset)
      case "StreamJobSqlSliding" | "StreamJobSingle" =>
        import parsed.sparkSession.implicits._
        StreamingJobs.slidingCountStreaming(
          parsed.select(col("railway_class").as("key"), col("received_on").as("ts"))
            .as[StreamingJobs.KeyedEvent],
          frameSeconds = intervalSeconds(interval)).toDF()
      case other =>
        throw new IllegalArgumentException(s"unknown JOB_CLASS_NAME: $other")
    }
  }

  private def intervalSeconds(interval: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(interval))
    require(iv.months == 0, s"interval must be day-time, got: $interval")
    iv.days * 86400L + iv.microseconds / 1000000L
  }

  private def halfOf(interval: String): String =
    s"${math.max(1L, intervalSeconds(interval) / 2)} seconds"

  /** The upsert key per job shape: window aggregates key on
    * (key, window bounds) — the reference sink's idempotent key
    * (sink/SinkDataApiTumbling.java ON CONFLICT columns); the per-row
    * sliding jobs key on (key, ts) — latest trailing count per event
    * time, which replays idempotently. */
  def upsertKey(jobName: String): Seq[String] = jobName match {
    case "StreamJobSqlSliding" | "StreamJobSingle" => Seq("key", "ts")
    case _ => Seq("key", "window_start", "window_end")
  }

  /** Wire source → job → idempotent upsert sink and start the query.
    * `jdbcUrl = None` targets the in-memory store (tests/demos);
    * `Some(url)` the executing JDBC path (Derby/Postgres/…). */
  def start(jobName: String, raw: DataFrame, interval: String,
      checkpointDir: String, sinkTable: String,
      jdbcUrl: Option[String] = None): StreamingQuery = {
    val out = buildJob(jobName, raw, interval)
    val sink = jdbcUrl match {
      case Some(url) => UpsertSink.jdbcForeachBatchUpsert(url, sinkTable, upsertKey(jobName)) _
      case None => UpsertSink.foreachBatchUpsert(sinkTable, upsertKey(jobName)) _
    }
    out.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink)
      .start()
  }

  /** CLI — properties mirror the reference's config keys:
    * {{{
    * runMain graft.StarterDemo --job StreamJobSqlTumbling \
    *   --source dir:/tmp/feed --interval "1 minute" \
    *   --checkpoint /tmp/ckpt --table demo_tumbling [--jdbc <url>]
    * }}}
    * With `--source dir:` the demo generates a deterministic feed into
    * the directory first ([[graft.sources.GeoJsonGen]]) when it is
    * empty, processes everything available, prints the sink contents,
    * and exits — a self-contained send.py + Starter run.
    */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val jobName = opts.getOrElse("--job", "StreamJobSqlTumbling")
    val source = opts.getOrElse("--source", "dir:/tmp/graft_demo_feed")
    val interval = opts.getOrElse("--interval", "1 minute")
    val ckpt = opts.getOrElse("--checkpoint",
      java.nio.file.Files.createTempDirectory("graft_demo_ckpt").toString)
    val table = opts.getOrElse("--table", "demo_sink")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = source.split(":", 2) match {
      case Array("dir", path) =>
        val dir = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.isDirectory(dir) ||
            !java.nio.file.Files.list(dir).findFirst().isPresent)
          // 1.2 s event-time steps: 500 records span 10 minutes, so a
          // 1-minute append-mode window demo closes ~9 windows (50 ms
          // steps — send.py's cadence — would close none)
          graft.sources.GeoJsonGen.writeFiles(dir, seed = 42L, count = 500,
            startEpochMs = java.time.Instant.parse("2020-09-14T09:20:00Z").toEpochMilli,
            stepMs = 1200L)
        Sources.geojsonLinesDir(spark, path)
      case Array("kinesis", rest) =>
        val parts = rest.split(":")
        Sources.kinesis(spark, parts(0), parts(1),
          if (parts.length > 2) parts(2) else "LATEST")
      case _ =>
        throw new IllegalArgumentException(s"unknown --source: $source (dir:<path> | kinesis:<stream>:<region>[:<pos>])")
    }

    val q = start(jobName, raw, interval, ckpt, table, opts.get("--jdbc"))
    if (source.startsWith("dir:")) {
      q.processAllAvailable() // bounded demo feed: drain and exit
      q.stop()
      val rows = UpsertSink.InMemoryStore.snapshot(table)
      println(s"[demo] $jobName emitted ${rows.size} rows to '$table'")
      rows.toSeq.sortBy(_._1.mkString(",")).take(20).foreach { case (k, v) =>
        println(s"[demo]   ${k.mkString("|")} -> ${v.mkString(", ")}")
      }
      spark.stop()
    } else {
      q.awaitTermination() // live source: run until externally stopped
    }
  }
}
