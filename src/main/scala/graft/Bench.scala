package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one compact JSON line on stdout, full detail on disk.
  *
  * Measurement policy (BASELINE.md quotes this):
  *  - every query runs twice; the cold map is the FIRST run, the warm
  *    map is the best of two (steady state, immune to one GC pause /
  *    JIT recompile);
  *  - the headline `value` is the COLD total: queries run in family
  *    order, so each one-time shared cost (the shingle index, the
  *    normalized-vector cache, the memoized connected-components
  *    labels) is paid by exactly one first run and appears in the
  *    total exactly once — nothing is hidden by a warm cache, and
  *    nothing is double-charged. `total_warm` is the best-of-2 sum,
  *    comparable to rounds 1–2;
  *  - cached frames are family-scoped: the dedup → pipeline → sim
  *    families legitimately share plan-cached frames (shingles, pair
  *    graph, vectors), so they run first as one block, then ALL caches
  *    are released before the relational/text/multimodal families —
  *    a pinned shingle index must not squeeze execution memory for an
  *    unrelated TPC-H join (the round-2 bench regression).
  *
  * Reporting contract: the consumer of stdout keeps only the LAST
  * ~2000 bytes (BENCH_r03's line outgrew that window and the headline
  * was truncated away, so the round went ungraded). The stdout line is
  * therefore kept compact — 3-decimal seconds, per-query map limited
  * to the BASELINE.md comparison set plus any other query slower than
  * 1 s — and the complete full-precision cold/warm maps are written to
  * `BENCH_DETAIL.json` in the working directory (the repo root when
  * run via sbt), referenced from the line's `detail` field.
  */
object Bench {
  /** The 44 queries in BASELINE.md's per-query table — the per-query
    * comparison targets. Everything else is summarized in the line's
    * totals and fully listed in BENCH_DETAIL.json. */
  private val baselineSet: Set[String] = Set(
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_survivors",
    "multimodal_decode", "q10_returned_revenue", "q17_small_quantity",
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q_agg_value_stats", "q_anti_join", "q_brand_stats",
    "q_count_aggregator", "q_distinct_counts", "q_filter_pushdown",
    "q_hopping_count", "q_json_extract", "q_lag_gap",
    "q_last_window_upsert", "q_rank_suppliers", "q_rollup",
    "q_salted_agg", "q_semi_join", "q_session_window", "q_set_ops",
    "q_sliding_over_1m", "q_sliding_over_30m", "q_sliding_over_chunked",
    "q_topk_orders", "q_ts_roundtrip", "q_tumbling_count",
    "q_tumbling_count_sql", "q_tumbling_offset", "sim_ann_ivf",
    "sim_ann_lsh", "sim_topk_bruteforce", "text_fingerprint",
    "text_lang_id", "text_stats", "text_token_count", "text_vocab")

  private def f3(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches BASELINE.md's measurement config (local[32], 32
    // shuffle partitions); override via SPARK_GRAFT_CPUS for smaller boxes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (JVM/codegen/FS init) so the first timed query
    // isn't charged for it; the flagship on sf0.001 is sub-second
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // family order: the cache-sharing block (dedup/pipeline/sim) first,
    // then families that pin nothing; alphabetical inside a family
    val familyOrder = Seq("dedup", "pipeline", "sim", "multimodal", "q", "text")
    def family(name: String): String = name.takeWhile(_ != '_')
    val byFamily = SparkEntry.queries.toSeq.sortBy(_._1).groupBy(q => family(q._1))
    val orderedFamilies =
      familyOrder.filter(byFamily.contains) ++
        byFamily.keys.toSeq.filterNot(familyOrder.contains).sorted
    val sharedCacheFamilies = Set("dedup", "pipeline", "sim")

    val results = orderedFamilies.flatMap { fam =>
      val rows = byFamily(fam).map { case (name, fn) =>
        // a failed query must NOT masquerade as a fast success: record -1
        val times = try Seq(once(fn), once(fn)) catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); Seq(-1.0)
        }
        (name, times.head, times.min)
      }
      // release pinned frames once the last family of the sharing block
      // (or any isolated family) is done — later families start unpinned
      if (!sharedCacheFamilies.contains(fam) || fam == "sim")
        graft.model.Tables.clearCaches(spark)
      rows
    }

    // any failure poisons the totals: a broken run must never look fast
    val failed = results.exists(_._3 < 0)
    val totalCold = if (failed) -1.0 else results.map(_._2).sum
    val totalWarm = if (failed) -1.0 else results.map(_._3).sum

    // full-precision detail file: every query, cold + warm, plus policy
    def fullMap(sel: ((String, Double, Double)) => Double): String =
      results.map { case r @ (k, _, _) => "\"" + k + "\":" + sel(r) }
        .mkString("{", ",", "}")
    val detailPath = "BENCH_DETAIL.json"
    // the direct like-for-like number against BASELINE.md's 41.4 s:
    // warm sum over exactly its 44 per-query comparison targets
    // (the full-suite totals span 2× more queries than the baseline
    // measured, so ratios on them are not apples-to-apples). A rename
    // in the registry must not silently shrink the sum and fake a
    // speedup — surface the matched count next to the number.
    val baseline44Matched = results.count(r => baselineSet.contains(r._1))
    if (baseline44Matched != baselineSet.size)
      System.err.println(
        s"[bench] WARNING: only $baseline44Matched of ${baselineSet.size} baseline queries matched the registry")
    val baseline44Warm =
      if (failed) -1.0
      else results.filter(r => baselineSet.contains(r._1)).map(_._3).sum

    val detailJson = (s"""{"metric":"total","value":$totalCold,"unit":"sec""""
      + s""","queries":${fullMap(_._3)},"queries_cold":${fullMap(_._2)}"""
      + s""","total_warm":$totalWarm,"baseline44_warm":$baseline44Warm"""
      + s""","baseline44_n":$baseline44Matched"""
      + s""","n":${results.size},"sf":"$sfDir""""
      + s""","run_policy":"value=cold total (each one-time shared cost paid exactly once, in family order); queries=best-of-2 steady state; caches released after the dedup/pipeline/sim block"}""")
    // the stdout line is the artifact of record — a failed detail write
    // (read-only cwd, full disk) must never discard the whole run
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (detailJson + "\n").getBytes("UTF-8"))
    catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }

    // compact stdout line: baseline comparison set + anything ≥ 1 s warm,
    // 3-decimal seconds; hard cap well inside the 2000-byte tail window
    def compactLine(sel: Set[String]): String = {
      val m = results.filter(r => sel.contains(r._1))
        .map { case (k, _, w) => "\"" + k + "\":" + f3(w) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(totalCold)},"unit":"sec"""" +
        s""","queries":$m,"total_warm":${f3(totalWarm)}""" +
        s""","baseline44_warm":${f3(baseline44Warm)},"baseline44_n":$baseline44Matched""" +
        s""","n":${results.size}""" +
        s""","sf":"$sfDir","detail":"$detailPath"}"""
    }
    val slowExtras = results.filter(r => !baselineSet.contains(r._1) && r._3 >= 1.0)
      .sortBy(-_._3).take(10).map(_._1).toSet
    val line = Seq(baselineSet ++ slowExtras, baselineSet, Set.empty[String])
      .map(compactLine).find(_.length <= 1800).getOrElse(compactLine(Set.empty))
    println(line)
    graft.model.Tables.clearCaches(spark) // release library-pinned frames/memos
    spark.stop()
  }
}
