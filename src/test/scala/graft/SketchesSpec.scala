package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.functions.Sketches.{CmsSketch, KmvSketch}

/** Unit + property coverage for the distributed sketch aggregates:
  * partition-count invariance (the merge path), agreement with a
  * brute-force single-pass reference, the CMS overestimate bound, and
  * the ObjectHashAggregate plan shape that carries the 100 TB claim. */
class SketchesSpec extends SparkSpec {
  import org.scalatest.prop.TableDrivenPropertyChecks._

  private val M = 2147483647L

  test("KMV minima equal the brute-force k smallest distinct hashes, any partitioning") {
    import spark.implicits._
    val keys = (1L to 5000L).map(i => (i * 7919L) % 1000L) // ~1000 distinct, heavy repeats
    val expected = keys.map(x => (x * 2654435761L + 104729L) % M)
      .distinct.sorted.take(64)
    forAll(Table("parts", 1, 3, 17)) { parts =>
      val got = keys.toDF("k").repartition(parts)
        .select((((col("k") * lit(2654435761L)) + lit(104729L)) % lit(M)).as("h"))
        .agg(Sketches.kmvMinima(col("h"), 64))
        .collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("KMV with fewer distinct values than k returns them all (exact regime)") {
    import spark.implicits._
    val got = Seq(5L, 5L, 9L, 1L, 9L).toDF("h")
      .agg(Sketches.kmvMinima(col("h"), 64)).collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 5L, 9L))
  }

  test("KMV estimator is within 20% of the true distinct count on uniform keys") {
    import spark.implicits._
    val n = 20000L
    val row = spark.range(1, n + 1)
      .select((((col("id") * lit(2654435761L)) + lit(104729L)) % lit(M)).as("h"))
      .agg(Sketches.kmvMinima(col("h"), 64).as("m"))
      .select(element_at(col("m"), 64).as("kth"))
      .collect()(0)
    val est = 63L * M / row.getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.2, s"est=$est true=$n")
  }

  test("CMS point estimates never underestimate and match across partitionings") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "beta", "beta", "alpha")
    val corpus = (words ++ words ++ Seq("epsilon")).toDF("token")
    val exact = (words ++ words ++ Seq("epsilon"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def sketchOf(parts: Int): Seq[Long] =
      corpus.repartition(parts)
        .agg(Sketches.cmsSketch(col("token"), 4, 256)).collect()(0).getSeq[Long](0)
    val sk = sketchOf(1)
    forAll(Table("parts", 2, 5)) { parts => assert(sketchOf(parts) == sk) }
    // N tokens total lands in each row exactly once
    (0 until 4).foreach { j =>
      assert(sk.slice(j * 256, (j + 1) * 256).sum == corpus.count())
    }
    exact.foreach { case (tok, cnt) =>
      val h = CmsSketch.poly31(org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      val est = (0 until 4).map(j => sk(j * 256 + CmsSketch.cell(h, j, 256))).min
      assert(est >= cnt, s"$tok: est $est < exact $cnt")
    }
  }

  test("sketch aggregates plan as ObjectHashAggregate (map-side partial combine)") {
    val p = SparkEntry.queries("q_distinct_kmv")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortAggregate"), p)
    val p2 = SparkEntry.queries("text_heavy_hitters_cms")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p2.contains("ObjectHashAggregate"), p2)
    // the sketch side broadcasts its single row to the top-k side
    assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("BroadcastExchange"), p2)
    // the sample-quantile sketch rides the same aggregate: map-side
    // partial combine, never a SortAggregate row sort
    val p3 = SparkEntry.queries("q_quantiles_sketch")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p3).size >= 2, p3)
    assert(!p3.contains("SortAggregate"), p3)
    // the overlap pair frame is sketch-sized: its self-join must be a
    // broadcast, never a shuffle of the sketch rows
    val p4 = SparkEntry.queries("text_vocab_overlap_kmv")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p4.contains("BroadcastNestedLoopJoin") || p4.contains("BroadcastExchange"), p4)
    assert(!p4.contains("SortMergeJoin"), p4)
  }

  test("sketches aggregate incrementally in a streaming windowed query == batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp)]
    val hash = (((length(col("tok")).cast("long") * lit(2654435761L)) + lit(104729L)) % lit(2147483647L))
    def aggs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("t"), "1 minute"))
        .agg(
          Sketches.cmsSketch(col("tok"), 4, 64).as("cms"),
          Sketches.kmvMinima(hash, 8).as("kmv"),
          Sketches.hllRegisters(hash, 8).as("hll"))
        .select(col("window.start").as("ws"), col("cms"), col("kmv"), col("hll"))
    val q = aggs(in.toDF().toDF("tok", "t"))
      .writeStream.outputMode("complete").format("memory").queryName("sk_out").start()
    try {
      val batch1 = Seq(("alpha", ts("2024-01-01 00:00:10")), ("beta", ts("2024-01-01 00:00:20")))
      val batch2 = Seq(("alpha", ts("2024-01-01 00:00:40")), ("gamma", ts("2024-01-01 00:01:15")))
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("sk_out").collect()
        .map(r => (r.getTimestamp(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3))).toSet
      val batch = aggs((batch1 ++ batch2).toDF("tok", "t")).collect()
        .map(r => (r.getTimestamp(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3))).toSet
      // incremental (state-merged across micro-batches) == one-shot batch
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00")))
    } finally q.stop()
  }

  test("serialize/deserialize round-trips both sketch buffers") {
    val kmv = KmvSketch(org.apache.spark.sql.graftbridge.Bridge.expression(lit(0L)), 8)
    val kb = kmv.createAggregationBuffer()
    Seq(42L, 7L, 42L, 99L).foreach { h =>
      kb.minima.add(h); ()
    }
    val kb2 = kmv.deserialize(kmv.serialize(kb))
    assert(kb2.minima == kb.minima)

    val cms = CmsSketch(org.apache.spark.sql.graftbridge.Bridge.expression(lit("x")), 2, 8)
    val cb = cms.createAggregationBuffer()
    cb(3) = 5L; cb(9) = 11L
    assert(cms.deserialize(cms.serialize(cb)).toSeq == cb.toSeq)

    val hll = Sketches.HllSketch(org.apache.spark.sql.graftbridge.Bridge.expression(lit(0L)), 8)
    val hb = hll.createAggregationBuffer()
    hb(0) = 3; hb(255) = 24
    assert(hll.deserialize(hll.serialize(hb)).toSeq == hb.toSeq)
  }

  test("HLL registers equal a brute-force replica, any partitioning") {
    import spark.implicits._
    val keys = (1L to 5000L).map(i => (i * 7919L) % 1500L)
    val expected = {
      val regs = new Array[Long](256)
      keys.map(x => (x * 2654435761L + 104729L) % M).distinct.foreach { h =>
        val reg = (h >>> 23).toInt
        val w = h & 0x7FFFFFL
        val rho = if (w == 0L) 24L else 24L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(reg)) regs(reg) = rho
      }
      regs.toSeq
    }
    forAll(Table("parts", 1, 3, 17)) { parts =>
      val got = keys.toDF("k").repartition(parts)
        .select((((col("k") * lit(2654435761L)) + lit(104729L)) % lit(M)).as("h"))
        .agg(Sketches.hllRegisters(col("h"), 8))
        .collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("HLL raw estimate is within 15% of the true distinct count on uniform keys") {
    import spark.implicits._
    val n = 20000L
    val est = (1L to n).toDF("k")
      .select((((col("k") * lit(2654435761L)) + lit(104729L)) % lit(M)).as("h"))
      .agg(Sketches.hllRegisters(col("h"), 8).as("regs"))
      .select(expr("(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / " +
        "aggregate(regs, cast(0.0 as double), " +
        "(acc, r) -> acc + 1.0 / cast(shiftleft(1L, cast(r as int)) as double))"))
      .collect()(0).getDouble(0)
    // standard error ~1.04/√256 = 6.5%; 15% is > 2σ
    assert(math.abs(est - n.toDouble) / n.toDouble < 0.15, s"est=$est")
  }

  test("bottom-k sample quantiles track the exact quantile vector") {
    val exact = SparkEntry.queries("q_quantiles_exact")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val est = SparkEntry.queries("q_quantiles_sketch")(spark, sf0001).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val flag = r.getString(0)
      val e = exact(flag)
      // m = 256 ⇒ rank error ~√(p(1-p))·√m ≤ 8 ranks (3σ) of 256 ≈ 3%
      // of the [1,50] value range per quantile; 8 units is > 3σ here
      Seq(1, 2, 3, 4, 5).foreach { i =>
        val got = r.getLong(i).toDouble
        val want = e.getDouble(i)
        assert(math.abs(got - want) <= 8.0,
          s"$flag p@$i: sample $got vs exact $want")
      }
      assert(r.getLong(6) == 256L, s"$flag sample not saturated: ${r.getLong(6)}")
    }
  }

  test("KMV pair-overlap estimates bound and track exact vocabulary Jaccard") {
    import spark.implicits._
    val out = SparkEntry.queries("text_vocab_overlap_kmv")(spark, sf0001).collect()
    val vocab = graft.model.Tables.load(spark, sf0001, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val nSrc = vocab.size
    assert(out.length == nSrc * (nSrc - 1) / 2, s"pair count ${out.length}")
    out.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (m, nb) = (r.getLong(2), r.getLong(3))
      val (ue, ie, jppm) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nb <= m && m <= 64, s"$sa/$sb: nb=$nb m=$m")
      assert(jppm >= 0 && jppm <= 1000000)
      assert(ie <= ue, s"$sa/$sb: inter $ie > union $ue")
      val (va, vb) = (vocab(sa), vocab(sb))
      val exactJ = (va & vb).size.toDouble / (va | vb).size
      // k = 64 ⇒ σ ≈ √(J(1−J)/64) ≤ 0.063; 0.25 is ≈ 4σ
      assert(math.abs(jppm / 1e6 - exactJ) <= 0.25,
        s"$sa/$sb: est ${jppm / 1e6} vs exact $exactJ")
      val exactU = (va | vb).size
      assert(math.abs(ue - exactU).toDouble / exactU <= 0.5,
        s"$sa/$sb: union est $ue vs exact $exactU")
      val (ca, cb) = (r.getLong(7), r.getLong(8))
      val exactCa = (va & vb).size.toDouble / va.size
      val exactCb = (va & vb).size.toDouble / vb.size
      assert(ca >= 0 && ca <= 1000000 && cb >= 0 && cb <= 1000000)
      assert(math.abs(ca / 1e6 - exactCa) <= 0.3,
        s"$sa/$sb: cont a→b ${ca / 1e6} vs exact $exactCa")
      assert(math.abs(cb / 1e6 - exactCb) <= 0.3,
        s"$sa/$sb: cont b→a ${cb / 1e6} vs exact $exactCb")
    }
  }

  test("KMV containment survives a side evicted from the combined sample (n_b = 0)") {
    import spark.implicits._
    // Heavy vocabulary skew CAN evict one side entirely: when every one
    // of B's token hashes sits above A's 64th-smallest hash, the
    // combined bottom-64 is all-A, so n_b = 0 and the unguarded
    // `(1000000 * n_both) div n_b` threw under ANSI mode. Plant exactly
    // that corpus and require the 0/0 → 0 ruling, not an error.
    def p31(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % M)
    val bigToks = (1 to 5000).map(i => f"w$i%05d")
    val k64 = bigToks.map(p31).distinct.sorted.apply(63)
    val tinyToks = Iterator.from(1).map(i => s"z$i")
      .filter(t => p31(t) > k64).take(30).toSeq
    assert(tinyToks.forall(t => p31(t) > k64))
    val docsRows =
      bigToks.grouped(500).zipWithIndex.map { case (g, i) =>
        (i.toLong, g.mkString(" "), "en", "aa_big", g.mkString(" ").length.toLong)
      }.toSeq :+
        (100L, tinyToks.mkString(" "), "en", "zz_tiny",
          tinyToks.mkString(" ").length.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("kmv_skew").toString
    try {
      docsRows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = SparkEntry.queries("text_vocab_overlap_kmv")(spark, tmp).collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getString(0) == "aa_big" && r.getString(1) == "zz_tiny")
      assert(r.getLong(3) == 0L, s"n_both=${r.getLong(3)}") // disjoint vocabularies
      assert(r.getLong(7) == 0L && r.getLong(8) == 0L,
        s"containment ppm: ${r.getLong(7)}/${r.getLong(8)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
