package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.queries.DedupQueries
import graft.streaming.StreamingJobs._

/** Streaming forms of the dedup operators: ingestion-time exact dedup
  * (bounded state via watermark) and online MinHash-LSH near-dup
  * candidate detection, both checked against their batch counterparts.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup keeps first occurrence, drops in-window copies") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = exactDedupStreaming(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      in.addData((1L, "alpha body", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      in.addData(
        (2L, "alpha body", ts("2024-01-01 00:10:00")), // dup of 1 within window
        (3L, "beta body", ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      in.addData((4L, "beta body", ts("2024-01-01 00:20:00"))) // dup of 3
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming LSH candidates across batches == batch bucket self-join (within retention)") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => (id, text, t0) } // one instant: nothing evicts
    assert(docs.nonEmpty)

    val in = MemoryStream[(Long, String, Timestamp)]
    val banded = DedupQueries
      .bandedDocs(in.toDF().toDF("doc_id", "text", "ts"), passthrough = Seq("ts"))
      .as[BucketDoc]
    val q = lshCandidatesStreaming(banded, retention = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("lsh_out").start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val streamed = spark.table("lsh_out")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

      val sh = Tables.load(spark, sf0001, "documents")
        .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("toks"))
        .select($"doc_id",
          graft.functions.KernelExpressions.sortedNgramSet($"toks", 3).as("g"))
      val batch = DedupQueries.lshCandidates(sh)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming LSH bucket state evicts after retention; operator keeps working") {
    implicit val sql = spark.sqlContext
    // two distinct near-dup texts: A/A' pair, B/B' pair, A≁B
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different content about spark shuffle partitions and joins here"
    val in = MemoryStream[(Long, String, Timestamp)]
    val banded = DedupQueries
      .bandedDocs(in.toDF().toDF("doc_id", "text", "ts"), passthrough = Seq("ts"))
      .as[BucketDoc]
    val q = lshCandidatesStreaming(banded, retention = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("lsh_evict").start()
    try {
      // t=00:00 doc 1 (A) fills its buckets
      in.addData((1L, textA, ts("2024-01-01 00:00:00"))); q.processAllAvailable()
      // t=01:00 doc 90 (B) pushes the watermark to 00:50 — far past
      // doc 1's buckets' timeout (00:10)
      in.addData((90L, textB, ts("2024-01-01 01:00:00"))); q.processAllAvailable()
      // next batch triggers timeout processing for doc 1's (data-less)
      // buckets → evicted
      in.addData((91L, textB, ts("2024-01-01 01:01:00"))); q.processAllAvailable()
      // doc 2 (A again) arrives after eviction: no pair with doc 1
      in.addData((2L, textA, ts("2024-01-01 01:02:00"))); q.processAllAvailable()
      val pairs = spark.table("lsh_evict")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L),
        s"doc 1 should have been evicted before doc 2 arrived: $pairs")
      // the operator still detects pairs inside the retention window
      assert(pairs.contains((90L, 91L)), s"in-window pair missing: $pairs")
    } finally q.stop()
  }

  test("streaming LSH hot bucket: anchor cap bounds state and emission to O(m·cap)") {
    implicit val sql = spark.sqlContext
    // 50 byte-identical boilerplate docs flood the same bucket in all
    // 16 bands; with cap=4 each arrival pairs against at most the 4
    // smallest ids seen, so the distinct pair set is the 4-anchor star
    // Σ_{a≤cap}(m−a) — not the uncapped 50·49/2 = 1225 — and bucket
    // state never exceeds cap members.
    val m = 50
    val cap = 4
    val text = "common boiler plate template shared verbatim by every crawl copy"
    val t0 = ts("2024-01-01 00:00:00")
    val in = MemoryStream[(Long, String, Timestamp)]
    val banded = DedupQueries
      .bandedDocs(in.toDF().toDF("doc_id", "text", "ts"), passthrough = Seq("ts"))
      .as[BucketDoc]
    val q = lshCandidatesStreaming(banded, retention = "1 hour", cap = cap)
      .writeStream.outputMode("append").format("memory").queryName("lsh_hot").start()
    try {
      in.addData((1 to m).map(i => (i.toLong, text, t0)): _*); q.processAllAvailable()
      val pairs = spark.table("lsh_hot")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs.size == (1 to cap).map(m - _).sum,
        s"expected the ${cap}-anchor star (${(1 to cap).map(m - _).sum}), got ${pairs.size}")
      assert(pairs.forall { case (a, _) => a <= cap })
      assert(pairs.flatMap(p => Set(p._1, p._2)) == (1L to m.toLong).toSet,
        "every member must still pair with an anchor")
    } finally q.stop()
  }

  test("streaming simhash candidates == batch block-banded pairs, narrow and wide") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    def run(sigCol: org.apache.spark.sql.Column, widths: Seq[Int], name: String,
        batch: Set[(Long, Long)]): Unit = {
      val docs = Tables.load(spark, sf0001, "documents")
        .select($"doc_id", sigCol.as("sh")).as[(Long, Long)].collect().toSeq
      val in = MemoryStream[SimhashDoc]
      val q = simhashCandidatesStreaming(in.toDS(), retention = "1 hour", widths = widths)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        val (b1, b2) = docs.splitAt(docs.size / 2)
        in.addData(b1.map { case (id, sh) => SimhashDoc(id, sh, t0) }: _*)
        q.processAllAvailable()
        in.addData(b2.map { case (id, sh) => SimhashDoc(id, sh, t0) }: _*)
        q.processAllAvailable()
        val streamed = spark.table(name)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        assert(streamed == batch, s"$name: stream=${streamed.size} batch=${batch.size}")
        assert(batch.nonEmpty)
      } finally q.stop()
    }
    run(graft.functions.TextFunctions.simhash31($"text"),
      DedupQueries.Simhash31Blocks, "simhash_stream",
      DedupQueries.queries("dedup_simhash")(spark, sf0001)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet)
    run(graft.functions.TextFunctions.simhash62($"text"),
      DedupQueries.Simhash62Blocks, "simhash_stream_wide",
      DedupQueries.queries("dedup_simhash_wide")(spark, sf0001)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet)
  }

  test("streaming simhash above 1024-bucket occupancy: SimhashAnchorCap default keeps " +
      "full recall; a saturated cap visibly loses the planted pair") {
    implicit val sql = spark.sqlContext
    // The r15 census measured hottest single-block bucket occupancy of
    // 2046/4750/13304 distinct signatures at sf0.1/sf1/sf10 — all past
    // the sparse-LSH LshBucketCap (1024) the operator once defaulted
    // to. Reproduce that regime synthetically: 1200 filler docs share
    // block0 = 0 AND block4 = 0 (two saturated buckets), differing in
    // the 18 bits of blocks 1–3; the planted pair (2000, 2001) shares
    // ONLY those two hot blocks (ham = 3, one differing bit in each of
    // blocks 1/2/3) and arrives after saturation. Any ham≤3 pair
    // shares ≥2 blocks (pigeonhole), so losing it requires BOTH shared
    // buckets past the cap — exactly this construction.
    val widths = DedupQueries.Simhash31Blocks // 7+6+6+6+6
    require(widths == Seq(7, 6, 6, 6, 6))
    def sig(b1: Long, b2: Long, b3: Long): Long =
      (b1 & 0x3f) << 7 | (b2 & 0x3f) << 13 | (b3 & 0x3f) << 19 // blocks 0 and 4 stay 0
    val fillers = (1 to 1200).map { i =>
      val h = i * 2654435761L // Knuth multiplicative spread over 18 bits
      (i.toLong, sig(h >>> 3, h >>> 9, h >>> 15))
    }
    val planted = Seq(
      (2000L, sig(8, 8, 8)),
      (2001L, sig(8 ^ 1, 8 ^ 2, 8 ^ 4))) // ham = 3, blocks 1/2/3 all differ
    val docs = fillers ++ planted
    val brute = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.contains((2000L, 2001L)))
    val t0 = ts("2024-01-01 00:00:00")
    def streamed(name: String, cap: Int): Set[(Long, Long)] = {
      val in = MemoryStream[SimhashDoc]
      val q = simhashCandidatesStreaming(in.toDS(), retention = "1 hour",
        widths = widths, cap = cap)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        // three micro-batches (fillers | 2000 | 2001) so eviction order
        // is deterministic: state commits between batches, and a
        // saturated bucket holds exactly its cap smallest ids when the
        // planted partner arrives (within one batch the group iterator
        // order is not guaranteed and 2000/2001 could meet early)
        in.addData(fillers.map { case (id, sh) => SimhashDoc(id, sh, t0) }: _*)
        q.processAllAvailable()
        planted.foreach { case (id, sh) =>
          in.addData(SimhashDoc(id, sh, t0)); q.processAllAvailable()
        }
        spark.table(name).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    // default cap (SimhashAnchorCap = 16384): occupancy 1202 < cap, no
    // eviction, recall == brute truth
    val full = streamed("simhash_hot_default", DedupQueries.SimhashAnchorCap)
    assert(full == brute, s"default cap lost recall: ${brute -- full}")
    // the old LshBucketCap default: both hot buckets evict past 1024
    // anchors, 2000 is gone from each before 2001 arrives — the pair
    // is silently dropped (this is the regression the default fix closes)
    val capped = streamed("simhash_hot_capped", DedupQueries.LshBucketCap)
    assert(!capped.contains((2000L, 2001L)),
      "planted pair survived a saturated cap — the construction no longer binds")
    assert(capped.subsetOf(brute) && capped.size < brute.size)
  }

  test("streaming incremental ingest == batch dedup_incremental corpus-probe component") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val d = Tables.load(spark, sf0001, "documents")
    val corpus = d.filter($"doc_id" % 5 =!= 4).select("doc_id", "text")
    val newDocs = d.filter($"doc_id" % 5 === 4)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = incrementalDedupStreaming(
        in.toDF().toDF("doc_id", "text", "ts"), corpus, retention = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("incr_out").start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.size / 2)
      in.addData(b1.map { case (id, t) => (id, t, t0) }: _*); q.processAllAvailable()
      in.addData(b2.map { case (id, t) => (id, t, t0) }: _*); q.processAllAvailable()
      val streamed = spark.table("incr_out")
        .select("new_id", "matched_id").as[(Long, Long)].collect().toSet
      // the stream job covers the new×corpus screen; within-feed peer
      // pairs are lshCandidatesStreaming's half of the contract
      val batch = DedupQueries.queries("dedup_incremental")(spark, sf0001)
        .filter($"matched_id" % 5 =!= 4)
        .select("new_id", "matched_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming CDC ingest marks exactly the chunks absent from the corpus index") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val d = Tables.load(spark, sf0001, "documents")
    val corpus = d.filter($"doc_id" % 5 =!= 4).select("doc_id", "text")
    val newDocs = d.filter($"doc_id" % 5 === 4)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = cdcIngestStreaming(in.toDF().toDF("doc_id", "text", "ts"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("cdc_out").start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.size / 2)
      in.addData(b1.map { case (id, t) => (id, t, t0) }: _*); q.processAllAvailable()
      in.addData(b2.map { case (id, t) => (id, t, t0) }: _*); q.processAllAvailable()
      val streamed = spark.table("cdc_out")
        .select($"doc_id", $"chunk_idx", $"chunk_hash", $"is_new")
        .as[(Long, Long, String, Boolean)].collect().toSet
      // batch replica: chunk the arrivals, left-anti the corpus index
      val arrivals = graft.queries.PipelineQueries.cdcChunks(
        d.filter($"doc_id" % 5 === 4).select("doc_id", "text"))
      val storedHashes = graft.queries.PipelineQueries.cdcChunks(corpus)
        .select("chunk_hash").distinct().as[String].collect().toSet
      val batch = arrivals.select($"doc_id", $"chunk_idx", $"chunk_hash")
        .as[(Long, Long, String)].collect()
        .map { case (id, ci, h) => (id, ci, h, !storedHashes.contains(h)) }.toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
      // the planted duplicates give both verdicts: some chunks are
      // already stored, some are genuinely new
      assert(streamed.exists(_._4) && streamed.exists(!_._4))
    } finally q.stop()
  }

  test("streaming decontamination across batches == batch LSH decontamination") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val d = Tables.load(spark, sf0001, "documents")
    val evalDocs = d.filter($"source" === "src0").select("doc_id", "text")
    val train = d.filter($"source" =!= "src0")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => (id, text, t0) } // one instant: nothing evicts

    val in = MemoryStream[(Long, String, Timestamp)]
    val q = decontaminateStreaming(
        in.toDF().toDF("doc_id", "text", "ts"), evalDocs, retention = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("decon_out").start()
    try {
      val (b1, b2) = train.splitAt(train.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val streamed = spark.table("decon_out")
        .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
      val batch = graft.queries.PipelineQueries
        .queries("pipeline_decontaminate_lsh")(spark, sf0001)
        .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture must contain cross-source near-dups")
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      // every flagged pair is directed train → eval and within threshold
      val jacs = spark.table("decon_out").select("jac").as[Double].collect()
      assert(jacs.forall(_ >= 0.8))
    } finally q.stop()
  }

  test("streaming Gopher gate == batch rule battery across batches") {
    implicit val sql = spark.sqlContext
    val d = Tables.load(spark, sf0001, "documents")
    val all = d.select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val q = gopherGateStreaming(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("gopher_out").start()
    try {
      val (b1, b2) = all.splitAt(all.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
          r.getLong(10), r.getLong(11))
      val streamed = spark.table("gopher_out").collect().map(key).toSet
      val batch = graft.queries.TextQueries.queries("text_gopher_rules")(spark, sf0001)
        .collect().map(key).toSet
      assert(streamed == batch && batch.size == all.size)
    } finally q.stop()
  }

  test("streaming ANN search over the frozen index == batch multiprobe top-5") {
    implicit val sql = spark.sqlContext
    val emb = Tables.load(spark, sf0001, "embeddings")
    val t0 = ts("2024-01-01 00:00:00")
    val queries10 = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, v) => (id, v, t0) }
    assert(queries10.size == 10)

    val in = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = annSearchStreaming(
        in.toDF().toDF("query_id", "embedding", "ts"), emb)
      .writeStream.outputMode("append").format("memory").queryName("ann_out").start()
    try {
      val (b1, b2) = queries10.splitAt(5)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      // sink-side ranking: the shared top-5 rule over the streamed
      // candidate set (a query's candidates land in one micro-batch)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy($"cos".desc, $"neighbor_id")
      val streamed = spark.table("ann_out")
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select("query_id", "neighbor_id", "cos")
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.queries.SimilarityQueries
        .queries("sim_ann_lsh_multiprobe")(spark, sf0001)
        .select("query_id", "neighbor_id", "cos")
        .as[(Long, Long, Double)].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"diff=${(streamed diff batch) ++ (batch diff streamed)}")
    } finally q.stop()
  }

  test("streaming DSIR scoring against a frozen index == batch weights") {
    implicit val sql = spark.sqlContext
    val d = Tables.load(spark, sf0001, "documents")
    val train = d.filter($"source" =!= "src0")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val q = dsirScoreStreaming(in.toDF().toDF("doc_id", "text"), d)
      .writeStream.outputMode("append").format("memory").queryName("dsir_out").start()
    try {
      val (b1, b2) = train.splitAt(train.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val streamed = spark.table("dsir_out")
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.queries.PipelineQueries
        .queries("pipeline_dsir_weights")(spark, sf0001)
        .as[(Long, Long, Double)].collect().toSet
      assert(batch.nonEmpty && streamed.size == train.size)
      assert(streamed == batch,
        s"diff=${(streamed diff batch) ++ (batch diff streamed)}")
    } finally q.stop()
  }

  test("streaming fuzzy match replaying the catalog == batch fuzzy self-join + exact hits") {
    implicit val sql = spark.sqlContext
    val catalog = Tables.load(spark, sf0001, "part")
      .select(col("p_name").as("name")).distinct()
    val names = catalog.as[String].collect().toSeq
    val in = MemoryStream[String]
    val q = fuzzyMatchStreaming(in.toDF().toDF("name"), catalog)
      .writeStream.outputMode("append").format("memory").queryName("fuzzy_out")
      .start()
    try {
      in.addData(names.take(names.size / 2): _*)
      q.processAllAvailable()
      in.addData(names.drop(names.size / 2): _*)
      q.processAllAvailable()
      val got = spark.table("fuzzy_out")
        .as[(String, String, Long)].collect().toSet
      // every probe finds itself exactly (lev 0)
      assert(names.forall(n => got.contains((n, n, 0L))),
        "exact self-hit missing")
      // unordered non-self matches == the batch self-join pair set
      val gotPairs = got.collect {
        case (a, b, _) if a < b => (a, b)
        case (a, b, _) if b < a => (b, a)
      }
      val batch = graft.queries.RelationalQueries
        .fuzzyNameMatches(catalog.toDF("name"))
        .select("name_a", "name_b").as[(String, String)].collect().toSet
      assert(batch.nonEmpty)
      assert(gotPairs == batch,
        s"diff=${(gotPairs diff batch) ++ (batch diff gotPairs)}")
    } finally q.stop()
  }

  test("streaming prefix-truncation replaying the corpus == batch pair set") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val base = "prefix truncation fixture body " * 3 // 93 chars ≥ 32
    val synth = Seq(
      (900001L, base),
      (900002L, base + " plus an extension tail"),
      (900003L, base + " plus an extension tail and more")
    ).toDF("doc_id", "text").withColumn("n_chars", length($"text").cast("long"))
    val corpus = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars").unionByName(synth)
    val batch = DedupQueries.prefixTruncationPairs(corpus)
      .select("short_id", "long_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty) // the synthetic chain guarantees pairs
    val replay = corpus.select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)].collect().toSeq
    val in = MemoryStream[(Long, String, Long, Timestamp)]
    val q = prefixTruncationStreaming(
        in.toDF().toDF("doc_id", "text", "n_chars", "ts"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("ptrunc_out").start()
    try {
      val (b1, b2) = replay.splitAt(replay.size / 2)
      in.addData(b1.map { case (id, t, n) => (id, t, n, t0) }: _*); q.processAllAvailable()
      in.addData(b2.map { case (id, t, n) => (id, t, n, t0) }: _*); q.processAllAvailable()
      val streamed = spark.table("ptrunc_out")
        .select("relation", "doc_id", "peer_id")
        .as[(String, Long, Long)].collect().toSet
      // arrival-centric rows → unordered (short, long) pairs; each
      // batch pair surfaces from BOTH ends of the replay
      val pairs = streamed.map {
        case ("prefix_of", id, peer) => (id, peer)
        case ("extends", id, peer)   => (peer, id)
        case other                   => fail(s"unexpected relation: $other")
      }
      assert(pairs == batch, s"diff=${(pairs diff batch) ++ (batch diff pairs)}")
      assert(streamed.size == 2 * batch.size, "each pair must emit from both ends")
    } finally q.stop()
  }

  test("streaming SNM replaying the corpus == batch sorted-neighborhood pairs") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val corpus = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars")
    val batch = DedupQueries.queries("dedup_sorted_neighborhood")(spark, sf0001)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    val replay = corpus.as[(Long, String, Long)].collect().toSeq
    val in = MemoryStream[(Long, String, Long, Timestamp)]
    val q = snmStreaming(
        in.toDF().toDF("doc_id", "text", "n_chars", "ts"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("snm_out").start()
    try {
      val (b1, b2) = replay.splitAt(replay.size / 2)
      in.addData(b1.map { case (id, t, n) => (id, t, n, t0) }: _*); q.processAllAvailable()
      in.addData(b2.map { case (id, t, n) => (id, t, n, t0) }: _*); q.processAllAvailable()
      val streamed = spark.table("snm_out")
        .select("doc_id", "peer_id", "jac").as[(Long, Long, Double)].collect().toSet
      val pairs = streamed.map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }
      assert(pairs == batch, s"diff=${(pairs diff batch) ++ (batch diff pairs)}")
    } finally q.stop()
  }

  test("streaming SNM flags a NEW arrival against its frozen-corpus rank neighborhood") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val corpus = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars")
    // perturb one mid token of the longest corpus doc: head/tail sort
    // keys survive, so the arrival lands in the victim's blocks and
    // must verify against it at τ = 0.8
    val (vid, vtext) = corpus.orderBy($"n_chars".desc, $"doc_id")
      .select($"doc_id", $"text").as[(Long, String)].head()
    val toks = vtext.split(" ")
    assume(toks.length >= 20, "need a long doc for a high-jac perturbation")
    toks(toks.length / 2) = "PERTURBED"
    val probe = toks.mkString(" ")
    val in = MemoryStream[(Long, String, Long, Timestamp)]
    val q = snmStreaming(
        in.toDF().toDF("doc_id", "text", "n_chars", "ts"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("snm_new_out").start()
    try {
      in.addData((999999L, probe, probe.length.toLong, t0))
      q.processAllAvailable()
      val got = spark.table("snm_new_out")
        .select("doc_id", "peer_id", "jac").as[(Long, Long, Double)].collect()
      assert(got.exists(r => r._1 == 999999L && r._2 == vid && r._3 >= 0.8),
        s"arrival must match its perturbed source: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming exact-substring screen == per-arrival reference against the corpus gram set") {
    implicit val sql = spark.sqlContext
    val L = DedupQueries.ExactSubstrL
    val t0 = ts("2024-01-01 00:00:00")
    val corpus = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    // arrivals: an exact copy of a corpus doc, a doc that embeds a
    // corpus doc's middle span inside novel padding, and pure novelty
    val corpusRows = corpus.as[(Long, String)].collect()
    val donor = corpusRows.maxBy(_._2.split(" ").length)
    val donorToks = donor._2.split(" ")
    assume(donorToks.length >= 3 * L, "need a long donor doc")
    val embedded = ((1 to L).map(i => s"nv$i") ++
      donorToks.slice(L, 2 * L + 4) ++ (1 to L).map(i => s"nw$i")).mkString(" ")
    val novel = (1 to 40).map(i => s"zz$i").mkString(" ")
    val arrivals = Seq((800001L, donor._2), (800002L, embedded), (800003L, novel))
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = exactSubstrStreaming(in.toDF().toDF("doc_id", "text", "ts"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("exsub_out").start()
    try {
      in.addData(arrivals.map { case (id, t) => (id, t, t0) }: _*)
      q.processAllAvailable()
      // advance the watermark past t0 (batch 2), then one more batch
      // so the aggregation emits under the advanced watermark
      in.addData((800099L, novel, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((800098L, novel, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val got = spark.table("exsub_out")
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .as[(Long, Long, Long, Long)].collect().toSet
      // reference: islands over offsets whose L-gram is in the corpus set
      val corpusGrams = corpusRows.iterator.flatMap { case (_, t) =>
        val tk = t.split(" ")
        if (tk.length < L) Iterator.empty
        else tk.sliding(L).map(_.mkString(" "))
      }.toSet
      val expect = arrivals.flatMap { case (id, t) =>
        val tk = t.split(" ")
        val hits = (1 to tk.length - L + 1)
          .filter(o => corpusGrams.contains(tk.slice(o - 1, o - 1 + L).mkString(" ")))
        hits.foldLeft(List.empty[(Long, Long)]) { (acc, o) =>
          acc match {
            case (s, e) :: tail if o <= e => (s, math.max(e, o + L)) :: tail
            case _                        => (o.toLong, (o + L).toLong) :: acc
          }
        }.reverse.map { case (s, e) => (id, s, e, e - s) }
      }.toSet
      assert(got == expect, s"diff=${(got diff expect) ++ (expect diff got)}")
      // shape of the three cases: full-doc span for the copy, one
      // interior span for the embed, nothing for the novel doc
      val n = donorToks.length.toLong
      assert(got.contains((800001L, 1L, n + 1, n)),
        s"exact copy must span the whole doc [1, ${n + 1}): $got")
      assert(got.count(_._1 == 800002L) == 1)
      assert(!got.exists(_._1 == 800003L))
    } finally q.stop()
  }

  test("record-linkage screens keep stream-static equi-join shapes — no all-pairs, no cartesian") {
    implicit val sql = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    val corpus = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars")
    def execPlanOf(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): String = {
      val in = MemoryStream[(Long, String, Long, Timestamp)]
      val q = build(in.toDF().toDF("doc_id", "text", "n_chars", "ts"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        in.addData((700001L, "plan probe fixture body " * 4, 96L, t0))
        q.processAllAvailable()
        q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
      } finally q.stop()
    }
    val pTrunc = execPlanOf(prefixTruncationStreaming(_, corpus), "pt_plan_out")
    assert(!pTrunc.contains("CartesianProduct") &&
      !pTrunc.contains("BroadcastNestedLoopJoin"), pTrunc)
    assert(pTrunc.contains("bkey"), pTrunc) // candidates via the 32-char block key
    val pSnm = execPlanOf(snmStreaming(_, corpus), "snm_plan_out")
    assert(!pSnm.contains("CartesianProduct") &&
      !pSnm.contains("BroadcastNestedLoopJoin"), pSnm)
    assert(pSnm.contains("skey"), pSnm) // both joins keyed on (pass, skey)
    val pEx = execPlanOf(exactSubstrStreaming(_, corpus), "ex_plan_out")
    assert(!pEx.contains("CartesianProduct") &&
      !pEx.contains("BroadcastNestedLoopJoin"), pEx)
    assert(pEx.contains("LeftSemi") || pEx.contains("left_semi"), pEx)
  }

  test("streaming fuzzy match probes a distributed index via stream-static equi-joins") {
    implicit val sql = spark.sqlContext
    val catalog = Tables.load(spark, sf0001, "part")
      .select(col("p_name").as("name")).distinct()
    val in = MemoryStream[String]
    val out = fuzzyMatchStreaming(in.toDF().toDF("name"), catalog)
    // logical shape: two stream-static joins (gram branch + short
    // block), no driver-side materialization of catalog names
    val joins = out.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 2, out.queryExecution.analyzed.toString)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("fuzzy_plan_out").start()
    try {
      in.addData("chartreuse lavender steel powder wheat")
      q.processAllAvailable()
      // physical shape of the micro-batch: equi-joins only — candidate
      // generation must never degrade to all-pairs against the catalog
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("CartesianProduct") &&
        !exec.contains("BroadcastNestedLoopJoin"), exec)
      assert(exec.contains("gram"), exec)
    } finally q.stop()
  }

  test("streaming SemDeDup replaying the corpus == batch dedup_semantic pairs; " +
      "stateless; equi-join plan") {
    implicit val sql = spark.sqlContext
    val emb = Tables.load(spark, sf0001, "embeddings")
    val t0 = ts("2024-01-01 00:00:00")
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, v) => (id, v, t0) }
    assert(all.size == 500)

    val in = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = semDedupStreaming(
        in.toDF().toDF("vec_id", "embedding", "ts"), sf0001)
      .writeStream.outputMode("append").format("memory")
      .queryName("semdedup_out").start()
    try {
      val (b1, b2) = all.splitAt(250)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val streamed = spark.table("semdedup_out")
        .select("new_id", "matched_id", "cos")
        .as[(Long, Long, Double)].collect().toSet
      // batch pairs are canonical (vec_a < vec_b); the directed stream
      // sees each unordered pair from both ends when the stream IS the
      // corpus, so the expectation is the symmetric closure
      val batch = graft.queries.DedupQueries
        .queries("dedup_semantic")(spark, sf0001)
        .select("vec_a", "vec_b", "cos")
        .as[(Long, Long, Double)].collect().toSet
      val expect = batch.flatMap { case (a, b, c) => Set((a, b, c), (b, a, c)) }
      assert(batch.nonEmpty && streamed == expect,
        s"diff=${(streamed diff expect) ++ (expect diff streamed)}")
      // stateless: assignment is projection + stream-static equi-joins
      val prog = q.lastProgress
      assert(prog.stateOperators.isEmpty ||
        prog.stateOperators.map(_.numRowsTotal).sum == 0L,
        prog.prettyJson)
      // plan shape: no all-pairs on the STREAM side — the coarse
      // argmax is a literal projection, fine + corpus probes are
      // equi-joins. Node-level traversal (not string matching): the
      // treeString also prints the CACHED index lineage under
      // InMemoryTableScan, where the batch assignment's accepted
      // k₁-row broadcast cross lives — that is the index build, paid
      // once, not the per-batch stream plan, and collect() does not
      // descend into cached plans.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def flat(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
        case st: QueryStageExec => flat(st.plan)
        case o => o.children.flatMap(flat)
      })
      val nodes = flat(
        q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan)
      val bad = nodes.map(_.nodeName).filter(n =>
        n.contains("CartesianProduct") || n.contains("BroadcastNestedLoopJoin"))
      assert(bad.isEmpty, bad.mkString(","))
      assert(nodes.exists(_.toString.contains("bucket")))
    } finally q.stop()
  }
}
