package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.Ingest
import graft.ops.Windows
import graft.sources.{GeoJsonGen, Sources}
import graft.streaming.UpsertSink

/** StarterDemo end-to-end on the connector-free stand-in: the
  * generator's deterministic feed (G1, send.py parity) through the
  * reference's job dispatch (S1, Starter.java:31–42 parity) into the
  * idempotent upsert store, converging to the batch answer over the
  * same records.
  */
class DemoSpec extends SparkSpec {
  import spark.implicits._

  private val FeedStart = java.time.Instant.parse("2020-09-14T09:20:00Z").toEpochMilli

  test("generator feed is deterministic under a seed and parses cleanly") {
    val a = GeoJsonGen.features(seed = 7L, count = 50, startEpochMs = FeedStart)
    val b = GeoJsonGen.features(seed = 7L, count = 50, startEpochMs = FeedStart)
    assert(a == b)
    val c = GeoJsonGen.features(seed = 8L, count = 50, startEpochMs = FeedStart)
    assert(a != c)
    // every record must take the real parse path, never the fallback:
    // parse with an impossible fallback instant and check it is absent
    val parsed = Ingest.parseGeoJson(a.toDF("value"),
      fallback = lit("1970-01-01 00:00:00").cast("timestamp"))
    assert(parsed.filter(col("received_on") === lit("1970-01-01 00:00:00").cast("timestamp")).count() == 0)
    assert(parsed.filter(col("railway_class").isNull).count() == 0)
  }

  test("StarterDemo dispatch: tumbling job on the file feed converges to the batch answer") {
    val dir = Files.createTempDirectory("graft_demo_feed")
    val ckpt = Files.createTempDirectory("graft_demo_ckpt").toString
    UpsertSink.InMemoryStore.clear("demo_tumbling")
    // 120 records × 50 ms = 6 s of event time per window isn't enough
    // to close a 1-minute window, so spread them: 1.2 s steps → 2.4 min
    GeoJsonGen.writeFiles(dir, seed = 42L, count = 120, startEpochMs = FeedStart,
      linesPerFile = 40, stepMs = 1200L)

    val q = StarterDemo.start("StreamJobSqlTumbling",
      Sources.geojsonLinesDir(spark, dir.toString),
      interval = "1 minute", checkpointDir = ckpt, sinkTable = "demo_tumbling")
    try q.processAllAvailable() finally q.stop()

    val lines = GeoJsonGen.features(seed = 42L, count = 120, startEpochMs = FeedStart, stepMs = 1200L)
    val batch = Windows.tumblingCount(
        Ingest.parseGeoJson(lines.toDF("value")),
        $"received_on", $"railway_class", "1 minute")
      .as[(String, Long, Timestamp, Timestamp)].collect()
      .map(r => (r._1, r._3.toString, r._2)).toSet
    // append mode can only emit windows the watermark passed; every
    // emitted row must match batch exactly, and most windows must close
    val store = UpsertSink.InMemoryStore.snapshot("demo_tumbling")
      .map { case (k, v) => (k(0).toString, k(1).toString, v(1).asInstanceOf[Long]) }.toSet
    assert(store.subsetOf(batch), s"store=$store\nbatch=$batch")
    assert(store.nonEmpty)
  }

  test("StarterDemo dispatch: sliding OVER job emits per-row trailing counts matching batch") {
    val dir = Files.createTempDirectory("graft_demo_feed_sl")
    val ckpt = Files.createTempDirectory("graft_demo_ckpt_sl").toString
    UpsertSink.InMemoryStore.clear("demo_sliding")
    GeoJsonGen.writeFiles(dir, seed = 5L, count = 60, startEpochMs = FeedStart,
      linesPerFile = 60, stepMs = 1000L)

    val q = StarterDemo.start("StreamJobSqlSliding",
      Sources.geojsonLinesDir(spark, dir.toString),
      interval = "30 seconds", checkpointDir = ckpt, sinkTable = "demo_sliding")
    try q.processAllAvailable() finally q.stop()

    // one file = one micro-batch = event-time-ordered processing, so
    // every row's trailing count matches the batch OVER exactly
    val lines = GeoJsonGen.features(seed = 5L, count = 60, startEpochMs = FeedStart, stepMs = 1000L)
    val parsed = Ingest.parseGeoJson(lines.toDF("value"))
    val batch = parsed
      .withColumn("trailing_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("railway_class")
          .orderBy(col("received_on").cast("long"))
          .rangeBetween(-30, 0)))
      .select(col("railway_class"), col("received_on"), col("trailing_cnt"))
      .as[(String, Timestamp, Long)].collect()
      .map(r => (r._1, r._2.toString, r._3)).toSet
    val store = UpsertSink.InMemoryStore.snapshot("demo_sliding")
      .map { case (k, v) => (k(0).toString, k(1).toString, v(2).asInstanceOf[Long]) }.toSet
    assert(store == batch, s"store=$store\nbatch=$batch")
    assert(store.nonEmpty)
  }

  test("hopping and offset dispatch build the reference window shapes") {
    val lines = GeoJsonGen.features(seed = 3L, count = 40, startEpochMs = FeedStart, stepMs = 5000L)
    val hop = StarterDemo.buildJob("StreamJobSqlHopping", lines.toDF("value"), "2 minutes")
      .as[(String, Long, Timestamp, Timestamp, Timestamp)].collect()
    // slide = size/2 = 1 minute: every event lands in exactly 2 windows
    assert(hop.map(_._2).sum == 80)
    // HOP_ROWTIME parity: rowtime = window_end - 1 ms
    assert(hop.forall(r => r._4.getTime - r._5.getTime == 1L))

    val off = StarterDemo.buildJob("StreamJobTumblingOffset", lines.toDF("value"), "60 seconds")
      .as[(String, Long, Timestamp, Timestamp)].collect()
    assert(off.map(_._2).sum == 40)
    // 15-second alignment offset, the reference's TumblingEventTimeWindows.of(size, offset)
    assert(off.forall(r => r._3.getTime % 60000L == 15000L))
  }

  test("unknown job name is rejected like the reference's switch default") {
    intercept[IllegalArgumentException] {
      StarterDemo.buildJob("NoSuchJob", Seq("{}").toDF("value"), "1 minute")
    }
  }
}
