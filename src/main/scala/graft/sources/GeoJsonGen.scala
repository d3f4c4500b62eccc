package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.functions.Lcg

/** Deterministic GeoJSON `Feature` generator — operator G1, the
  * send.py-parity data feed (reference send.py:8–35) with the Kinesis
  * `put_record` swapped for atomically-published line files that
  * [[Sources.geojsonLinesDir]] consumes. The demo pipeline is thereby
  * self-contained: generator → file stream → parse → window → upsert.
  *
  * Differences from send.py, both deliberate:
  *  - value choices come from the shared [[Lcg]] stream under an
  *    explicit seed (send.py uses `random.choice`) — tests and oracles
  *    replay byte-identical feeds;
  *  - `RECEIVED_ON` advances a fixed 50 ms per record from a given
  *    start instant (send.py sleeps 50 ms and stamps wall-clock now),
  *    emitted in the reference's microsecond ISO format
  *    (StreamJobSqlTumbling.java:66) so the parse path never hits the
  *    fallback.
  */
object GeoJsonGen {

  /** The reference generator's value domains (send.py:14–20). */
  private val RailwayClasses = Vector("11", "12", "13", "14", "15", "16", "17", "18")
  private val N02002 = Vector("1", "2", "3", "4", "5")
  private val LineNames = Vector(
    "joetsu-shinkansen", "kyushu-shinkansen", "hokkaido-shinkansen",
    "hokuriku-shinkansen", "sanyo-shinkansen", "tohoku-shinkansen",
    "tokaido-shinkansen")
  private val Operators = Vector("jr-east", "jr-west")

  private val IsoMicros =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)

  /** One deterministic Feature line per record: the send.py envelope
    * (type/properties with RECEIVED_ON, N02_001..4, ID, COUNT),
    * `stepMs` apart starting at `startEpochMs`. */
  def features(seed: Long, count: Int, startEpochMs: Long, stepMs: Long = 50L): Seq[String] = {
    val next = Lcg.stream(seed)
    def pick(xs: Vector[String]): String = xs((next() % xs.size).toInt)
    (0 until count).map { i =>
      val ts = IsoMicros.format(java.time.Instant.ofEpochMilli(startEpochMs + i * stepMs))
      val cls = pick(RailwayClasses)
      val n2 = pick(N02002)
      val line = pick(LineNames)
      val op = pick(Operators)
      val id = n2 + "_" + (next() % 101 + 1)
      val cnt = next() % 11 + 10
      s"""{"type":"Feature","properties":{"RECEIVED_ON":"$ts","N02_001":"$cls",""" +
        s""""N02_002":"$n2","N02_003":"$line","N02_004":"$op","ID":"$id","COUNT":$cnt}}"""
    }
  }

  /** Write `count` features into `dir` as `linesPerFile`-line files,
    * each published atomically (tmp + move — a half-written file must
    * never be picked up by the file-stream source). `rateSleepMs > 0`
    * paces publication like send.py's 50 ms sleep (per record). */
  def writeFiles(dir: Path, seed: Long, count: Int, startEpochMs: Long,
      linesPerFile: Int = 100, stepMs: Long = 50L, rateSleepMs: Long = 0L): Unit = {
    Files.createDirectories(dir)
    features(seed, count, startEpochMs, stepMs).grouped(linesPerFile).zipWithIndex.foreach {
      case (lines, i) =>
        val name = f"feed-$i%05d.json"
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
        Files.move(tmp, dir.resolve(name))
        if (rateSleepMs > 0) Thread.sleep(rateSleepMs * lines.size)
    }
  }

  /** CLI: `runMain graft.sources.GeoJsonGen <outDir> [count] [seed]
    * [linesPerFile] [rateSleepMsPerRecord]`. Start instant is fixed
    * (2020-09-14T09:20:00Z, the fixture epoch) so repeated runs with
    * one seed produce identical feeds. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GeoJsonGen <outDir> [count] [seed] [linesPerFile] [rateSleepMs]")
    val out = Paths.get(args(0))
    val count = if (args.length > 1) args(1).toInt else 500
    val seed = if (args.length > 2) args(2).toLong else 42L
    val perFile = if (args.length > 3) args(3).toInt else 100
    val sleep = if (args.length > 4) args(4).toLong else 0L
    val start = java.time.Instant.parse("2020-09-14T09:20:00Z").toEpochMilli
    writeFiles(out, seed, count, start, perFile, rateSleepMs = sleep)
    System.err.println(s"[geojson-gen] wrote $count features to $out (seed=$seed)")
  }
}
