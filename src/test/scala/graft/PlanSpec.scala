package graft

/** Physical-plan assertions: the properties that make these queries
  * survive a 100× scale-up are checked here, not just eyeballed.
  * If a refactor silently turns a broadcast join into a shuffle join or
  * breaks parquet pushdown, this suite fails.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** Count nested-loop joins that would actually EXECUTE for this
    * query: tree traversal (unlike the plan STRING) does not descend
    * into InMemoryTableScan's cached build plan, so prints of a
    * memoized frame's construction don't inflate the count. AQE roots
    * are unwrapped explicitly (AdaptiveSparkPlanExec is a leaf to
    * TreeNode.collect). */
  private def liveBnljCount(name: String): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    def count(p: SparkPlan): Int = p.collect {
      case _: BroadcastNestedLoopJoinExec => 1
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
    }.sum
    count(SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan)
  }

  test("filters reach the parquet scan (PushedFilters)") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
  }

  test("scan reads only projected columns (ReadSchema pruning)") {
    val p = plan("q_filter_pushdown")
    // 11-column lineitem: the aggregate needs only 4
    assert(p.contains("l_linestatus") && p.contains("l_extendedprice"), p)
    assert(!p.contains("l_orderkey"), s"unpruned scan: $p")
  }

  test("dimension joins broadcast instead of shuffling the fact table") {
    assert(plan("q_brand_stats").contains("BroadcastHashJoin"))
    assert(plan("q5_region_revenue").contains("BroadcastHashJoin"))
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q19's OR-of-ANDs join condition keeps the equi hash join, never a nested loop") {
    val p = plan("q19_discounted_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q13 shuffles map-combined per-customer counts, not raw order rows") {
    val p = plan("q13_customer_orders_dist")
    assert(p.contains("partial_count"), p)
  }

  test("grouped aggregates plan partial (map-side) + final hash aggregation") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_sum"), p)
  }

  test("windowed count is hash aggregation, not sort-based") {
    val p = plan("q_tumbling_count")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("ngram jaccard is an equi-join on the shingle — never a cartesian plan") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("minhash LSH candidates come from an equi-join on (band, bucket)") {
    val p = plan("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("bucket"), p)
  }

  test("chunked as-of join windows on (user, chunk) and broadcasts the carry frame") {
    val p = plan("q_asof_join_chunked")
    assert(p.contains("_chk"), p) // de-skew chunk column reaches the window spec
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("zorder audit: both layouts ride one exploded scan pass") {
    val p = plan("q_zorder_layout")
    assert(p.contains("Generate"), p) // explode of (layout, file) pairs
    assert(!p.contains("CartesianProduct"), p)
    // the fact table feeds exactly two scans: the 1-row bounds
    // bootstrap and the single exploded stats pass — a per-layout
    // union would make it three
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"$scans scans: $p")
  }

  test("candidate audit: generators stay equi-joins; truth marker joins via broadcast") {
    val p = plan("dedup_candidate_audit")
    // the only non-equi join allowed is the 1-row scalar n_true
    // crossJoin (BroadcastNestedLoopJoin over a single aggregate row)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("IVF ANN candidates come from an equi-join on the bucket id") {
    val p = plan("sim_ann_ivf")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("PQ ANN: ADC scan broadcasts the query tables; re-rank broadcasts the shortlist") {
    val p = plan("sim_ann_pq")
    // the ADC pass is an intentional broadcast of the 10-row query side
    // over the one-pass encoded corpus (same contract as
    // sim_topk_bruteforce); the re-rank stage must join the corpus via
    // BROADCAST of the tiny shortlist, never a shuffle of the vectors
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("IVF-PQ ANN: candidates from the bucket equi-join, no all-pairs ADC pass") {
    val p = plan("sim_ann_ivfpq")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("simhash candidates come from block-banded equi-joins — no all-pairs plan") {
    val p = plan("dedup_simhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding-cosine join is triangle block-partitioned — no all-pairs plan") {
    val p = plan("dedup_embedding_cosine")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ntile/percent_rank assemble global rank from range buckets — no single-key sort") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // every corpus-scale WindowExec must partition finer than the 5-key
    // event_type alone: the offset window (over ≤ types×64 aggregate
    // rows) is the ONLY single-column partitionBy allowed, and it is
    // identifiable by its running-sum frame over `bkt`
    def windows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
    }.flatten
    val plan = SparkEntry.queries("q_value_ntile")(spark, sf0001)
      .queryExecution.executedPlan
    val ws = windows(plan)
    assert(ws.nonEmpty, plan.toString)
    val rowScale = ws.filter(_.partitionSpec.size < 2)
    // the aggregate-level offset window orders by the bucket id; the
    // row-scale rank window orders by (value, event_id) — no window
    // ordered by value may partition by the key alone
    rowScale.foreach { w =>
      assert(w.orderSpec.exists(_.child.toString.contains("bkt")),
        s"corpus-scale window partitioned by key alone: $w")
    }
  }

  test("window top-N pushes the rank limit below the exchange (WindowGroupLimit)") {
    val p = plan("q_window_topn")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("lag de-skew partitions by (key, chunk), not key alone") {
    val p = plan("q_lag_gap")
    assert(p.contains("_chk"), p)
  }

  test("contamination screen broadcasts the eval span set — corpus never shuffles for the join") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join is a union-merge window — no range-join explosion or cartesian plan") {
    val p = plan("q_asof_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("exact median aggregates a value histogram, not a per-group row sort") {
    val p = plan("q_median_price")
    // the only full-data operator is the hash aggregate building the
    // (group, value) histogram; windows run over the aggregated frame
    assert(p.contains("HashAggregate"), p)
  }

  test("sliding OVER chunked variant partitions by (key, chunk), not key alone") {
    val p = plan("q_sliding_over_chunked")
    assert(p.contains("_chunk"), p)
  }

  test("interval join is a bucketized equi-join — no nested-loop range join") {
    val p = plan("q_interval_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bkt"), p)
  }

  test("bloom-pruned join filters the fact scan before the join") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"), p)
    // the probe predicate must sit below the join, in the scan stage's
    // Filter, so pruned rows never reach the exchange
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = math.max(p.indexOf("HashJoin"), p.indexOf("SortMergeJoin"))
    assert(filterIdx > joinIdx, s"filter above join: $p") // tree prints top-down
  }

  test("latest-snapshot compaction is an argmax aggregate, not a per-key sort window") {
    val p = plan("q_latest_snapshot")
    // ArgMax is a TypedImperativeAggregate: partial + final
    // ObjectHashAggregate, no sort-based fallback, no window
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("cumulate windows re-aggregate slices — expansion sits above the raw-event shuffle") {
    val p = plan("q_cumulate_count")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // two aggregation levels (slices, then expanded windows), each with
    // partial+final combine; the explode (Generate) must be above the
    // first aggregate, i.e. it multiplies slices, not events
    val genIdx = p.indexOf("Generate")
    val lastAggIdx = p.lastIndexOf("HashAggregate")
    assert(genIdx >= 0 && lastAggIdx > genIdx, s"explode below the slice aggregate: $p")
  }

  test("embedding outliers broadcast the centroids — the corpus joins without a shuffle") {
    val p = plan("sim_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("repetition-quality scoring is map-side — no exchange, no join, in codegen") {
    val p = plan("text_quality_repetition")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("*("), p) // codegen'd stages print as *(n)
  }

  test("gopher rule battery is map-side — no exchange, no join, in codegen") {
    val p = plan("text_gopher_rules")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("*("), p)
  }

  test("sequence packing windows by (lang, shard), never a global sort") {
    val p = plan("pipeline_pack_sequences")
    assert(p.contains("shard"), p)
    // the only sorts are the per-(lang, shard) window sorts — a global
    // (non-partitioned) window would print 'Window [... ORDER BY ...]'
    // with an empty partition spec and plan a SinglePartition exchange
    assert(!p.contains("SinglePartition"), p)
  }

  test("domain-mix single-partition window runs over the aggregated frame, not the corpus") {
    val p = plan("pipeline_domain_mix")
    // tree prints top-down: the SinglePartition exchange must sit ABOVE
    // the corpus-reducing hash aggregate
    val spIdx = p.indexOf("SinglePartition")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(spIdx >= 0 && aggIdx > spIdx, p)
  }

  test("semantic dedup pairs come from an equi-join on the cluster id") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), p)
    // the PAIR join is the bucket equi-join — the query's whole point
    assert(p.contains("SortMergeJoin [bucket") || p.contains("ShuffledHashJoin [bucket")
      || p.contains("BroadcastHashJoin [bucket"), p)
    // Subtree pin (the string count above can't distinguish PRINTS of
    // the memoized assignment's cached build plan from a join that
    // actually runs): collect nested-loop nodes in the LIVE tree —
    // tree traversal does not descend into InMemoryTableScan's cached
    // plan, so any hit here is a pair join that would execute per
    // query. dedup_semantic's live plan must have ZERO of them.
    assert(liveBnljCount("dedup_semantic") == 0, p)
  }

  test("sem-assignment broadcast hints ride only the O(√k) coarse quantizer, never the k-row centroid frame") {
    // k = n/32 grows with the corpus: a broadcast HINT on the fine
    // centroid frame would pin a corpus-proportional build side at
    // 100 TB. Only the two coarse-quantizer joins (k1 = ceil(sqrt(k))
    // rows) may carry hints; the fine cell join must be size-planned.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val assigned = graft.queries.SimilarityQueries.semAssigned(spark, sf0001)
    val hints = assigned.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }
    assert(hints.nonEmpty, "coarse-quantizer broadcasts should stay hinted")
    hints.foreach { h =>
      val out = h.child.output.map(_.name)
      assert(out.contains("co_id"),
        s"broadcast hint on a non-coarse frame (cols=$out) — build side may grow with n")
    }
  }

  test("sem-assignment has ZERO unpartitioned windows — centroid ids ride bucket-local ranks + driver-side offsets") {
    // The centroid-id numbering is bucketed row_number (partitioned by
    // the 64 fixed vec_id ranges) plus a literal offset map from a
    // ≤64-row driver-side histogram: no Window node anywhere in the
    // assignment may have an empty partitionSpec (round 12 — the old
    // row_number().over(Window.orderBy(vec_id)) single-partition-sorted
    // the k = n/32 centroid frame, ~3% of the corpus through one task).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val assigned = graft.queries.SimilarityQueries.semAssigned(spark, sf0001)
    val globals = assigned.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"unpartitioned window in the sem assignment: ${globals.map(_.child.output.map(_.name))}")
  }

  test("k-means refine never joins or collects the corpus — one aggregate chain") {
    val p = plan("sim_kmeans_refine")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pivot matrix is one hash aggregate keyed on the hour — categories are CASE partials") {
    val p = plan("q_pivot_hourly_matrix")
    // enumerated pivot values: no discovery job, no join, no explode;
    // one shuffle (the hour groupBy) with map-side partial combine
    assert(!p.contains("Join") && !p.contains("Generate"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("common-token scoring broadcasts the fixed-k vocab — corpus never shuffles for it") {
    val p = plan("text_common_token_ratio")
    // vocab side: word-count shuffle + top-k; corpus side: map-only
    // against the broadcast single-row vocab (intentional scalar BNLJ,
    // same pattern as text_tfidf's corpus-size broadcast)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup audit adds only a distinct + tiny aggregate over the shared pair frame") {
    val p = plan("pipeline_dedup_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH decontamination: banded equi-join candidates, never train×eval") {
    val p = plan("pipeline_decontaminate_lsh")
    // candidates come from the (band, bucket) equi-join; verification
    // joins the shingle index by id — nothing nested-loops or
    // broadcasts a corpus side
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("MIPS top-k is the intended one-pass broadcast scan (queries broadcast, corpus streams)") {
    val p = plan("sim_mips_topk")
    // same shape as sim_topk_bruteforce: tiny query side broadcast into
    // a BNLJ over one corpus scan — the exact baseline, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("grouping sets plan one Expand into a single shuffle — not one scan per grain") {
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("unpivot is a zero-shuffle Expand above the pivot aggregate") {
    val p = plan("q_unpivot_roundtrip")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join") && !p.contains("Generate"), p)
    // still only the pivot's hour-groupBy shuffle
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("per-group mode is stacked aggregates ending in argmax — no window, no sort") {
    val p = plan("q_mode_quantity")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("SCD2 intervals window per entity key — no global sort, no single partition") {
    val p = plan("q_scd2_intervals")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("salted join runs shuffled (the path salting exists for), not broadcast") {
    val p = plan("q_salted_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("curriculum deciles: single-partition window over the histogram only, broadcast back") {
    val p = plan("pipeline_curriculum_deciles")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // tree prints top-down: the SinglePartition exchange must sit ABOVE
    // the score-histogram aggregate (it never touches the corpus)
    val spIdx = p.indexOf("SinglePartition")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(spIdx >= 0 && aggIdx > spIdx, p)
  }

  test("epoch shuffle: corpus ranks inside hash-range buckets; only the 64-row offset frame is single-partition") {
    val p = plan("pipeline_epoch_shuffle")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the one SinglePartition exchange feeds the bucket-count offsets
    // (sits above the count aggregate in the top-down print); the
    // corpus-side row_number window partitions by bucket, never global
    val spIdx = p.indexOf("SinglePartition")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(spIdx >= 0 && aggIdx > spIdx, p)
    assert(p.contains("hashpartitioning(bucket"), p)
  }

  test("ahash near-dup candidates come from block-banded equi-joins — no all-pairs plan") {
    val p = plan("multimodal_ahash_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("video near-dup: both self-join sides scan the persisted frame index — codec pass runs once") {
    val p = plan("multimodal_video_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the persisted distinct (media_id, frame_fp) index must appear as
    // an in-memory scan on BOTH the a and b sides plus the hot-frame
    // guard — if the persist is dropped, the MapPartitions codec branch
    // reappears per side and this count collapses
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
  }

  test("incremental dedup probes the band index with equi-joins — no corpus re-pairing plan") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // candidates come from (band, bucket) probes, same as minhash_lsh
    assert(p.contains("bucket"), p)
  }

  test("chunk windows is a shuffle-free sequence explode at scan speed") {
    val p = plan("pipeline_chunk_windows")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), s"chunking must not shuffle: $p")
    assert(p.contains("Generate"), p) // the explode
  }

  test("canonical dedup is a map + one hash aggregate — no join, partial combine") {
    val p = plan("dedup_canonical")
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("hourly event dedup keys one aggregate on (digest, bucket) — no join, no window") {
    val p = plan("q_event_dedup_hourly")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("cross-modal audit is one id equi-join — no cartesian, no driver collect") {
    val p = plan("pipeline_crossmodal_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // full-outer on the id: a shuffle join both sides co-partition on
    assert(p.contains("FullOuter"), p)
  }

  test("classifier mix is pure map + one aggregate — no join, no window, map-side partials") {
    val p = plan("pipeline_classifier_mix")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("binary-sign ANN: signature scan joins the broadcast query set — no shuffle join") {
    val p = plan("sim_ann_binary")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the Hamming pass and the re-rank both broadcast the tiny side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("unigram rarity: vocab join is an equi-join, scalar N is a 1-row broadcast") {
    val p = plan("text_unigram_rarity")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the single-row corpus-total broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("source divergence: pair table broadcasts; no cartesian over the vocab") {
    val p = plan("text_source_divergence")
    assert(!p.contains("CartesianProduct"), p)
    // per-source counts reach the pair table via broadcast hash join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ngram novelty: span df joins through the inverted index, no cartesian") {
    val p = plan("text_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("DSIR: B-row ratio table broadcasts to the scoring join") {
    val p = plan("pipeline_dsir_weights")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("triangle census: every wedge/closure join is an equi-join — no cartesian") {
    val p = plan("dedup_graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cross-source matrix: corpus semi-joins down to graph endpoints before source lookup") {
    val p = plan("dedup_cross_source_matrix")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the documented 1-row scalar total
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("dup-ngram coverage: per-doc windows + equi-joins only, no cross-document movement") {
    val p = plan("text_dup_ngram_fraction")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("banding sweep: three band self-joins are (band, bucket) equi-joins — no cartesian") {
    val p = plan("dedup_banding_sweep")
    assert(!p.contains("CartesianProduct"), p)
    // scalar n_true cross join is the only nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("token budget: histogram offsets broadcast; corpus window is (score, bucket)-local") {
    val p = plan("pipeline_token_budget")
    assert(!p.contains("CartesianProduct"), p)
    // offsets + the 1-row budget scalar — never a corpus-sized nested loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("Window"), p)
  }

  test("leakage-free split: CC labels join by id; the only live nested-loop is the 1-row leak scalar") {
    val p = plan("pipeline_leakage_free_split")
    assert(!p.contains("CartesianProduct"), p)
    // The label join + pair join are hash equi-joins; the memoized
    // assignment's cached build plan may PRINT nested loops under
    // every consumer branch, but the LIVE tree (cached branches
    // excluded) may carry at most the 1-row leak-rate scalar BNLJ.
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(liveBnljCount("pipeline_leakage_free_split") <= 1, p)
  }

  test("session paths: two aggregates + TakeOrdered — word-count shape, no join at all") {
    val p = plan("q_session_paths")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the runtime complement to q_salted_join's manual salting: when
    // skew only shows up in real shuffle sizes, AQE must re-plan the
    // sort-merge join with split skewed partitions — the no-code-change
    // rail for hot keys at 100 TB. Thresholds are forced down so the
    // fixture-sized hot key (one key carrying ~100k padded rows vs 1k
    // singletons) crosses the detection bar.
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, rpad}
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(100000)
        .select(lit(0L).as("k"), rpad($"id".cast("string"), 64, "p").as("pad"))
        .unionByName(spark.range(1000).select(($"id" + 1).as("k"), lit("y").as("pad")))
      val right = spark.range(1001).select($"id".as("k"), lit("r").as("v"))
      val j = left.join(right, "k")
      // execute THIS QueryExecution (count() would build its own plan);
      // AQE finalizes the adaptive plan only once its query has run
      assert(j.collect().length == 101000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n${p.take(3000)}")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("winnow selection never leaves its input task — zero KEY shuffle, one explode") {
    // r16: the input-spread RoundRobin rebalance (Tables.loadSpread —
    // a no-op at cluster scale) is the ONE allowed exchange; the claim
    // with teeth is unchanged: no hash/range repartitioning, i.e. the
    // winnow selection itself never shuffles by key.
    val p = plan("text_winnow_fingerprint")
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"winnowing must not key-shuffle: $p")
    assert("Exchange".r.findAllIn(p).size <=
      "RoundRobinPartitioning".r.findAllIn(p).size,
      s"only the input-spread rebalance may shuffle: $p")
    assert(p.contains("Generate"), p) // the selected-set explode
  }

  test("no inferred explode filter ever re-evaluates the winnow expression") {
    // InferFiltersFromGenerate + pushdown substitution once inlined
    // the full gram-hash expression into a scan-level filter (434 s
    // on dedup_candidate_audit at sf0.1). Tables.load excludes the
    // rule; this pins both the exclusion and the plan consequence: no
    // Filter node may contain the gram-hash kernel.
    assert(spark.conf.get("spark.sql.optimizer.excludedRules", "")
      .contains("InferFiltersFromGenerate"))
    val p = plan("text_winnow_fingerprint")
    val filterWithHash = p.linesIterator
      .exists(l => l.contains("Filter") && l.contains("polyhasharray"))
    assert(!filterWithHash, s"inferred filter re-evaluates the gram hash: $p")
  }

  test("winnow pairs are an fp equi-join, never a cartesian plan") {
    val p = plan("dedup_winnow")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("cdc chunking never leaves the scan task — zero shuffle") {
    val p = plan("pipeline_cdc_chunks")
    assert(!p.contains("Exchange"), s"cdc chunking must not shuffle: $p")
  }

  test("cdc storage audit: the chunk-identity distinct is the only wide chunk op") {
    val p = plan("dedup_cdc_storage")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"chunk aggregates must map-side combine: $p")
  }

  test("cep chain joins are (user, day)-keyed equi-joins, never nested loops") {
    val p = plan("q_cep_first_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("prefix-truncation dedup is a block-key equi-join with the anchor-cap window") {
    val p = plan("dedup_prefix_truncation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bkey"), p) // candidates come from the 32-char block key
  }

  test("sorted-neighborhood pairs are (pass, skey) equi-joins on rank triples") {
    val p = plan("dedup_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("skey"), p)
  }

  test("fuzzy join candidates come from the gram-prefix equi-join, never all-pairs") {
    val p = plan("q_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("exact-substring dedup is gram-hash aggregate + equi-join — no pair join anywhere") {
    val p = plan("dedup_exact_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // survival is a partial (map-combined) count over gram hashes, so
    // a boilerplate gram is one combiner cell, never a fan-out
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("bm25 top-k is TakeOrderedAndProject over a map-combined tf aggregate") {
    val p = plan("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q6 is a single pushed-filter scan + partial aggregate — no shuffle rows beyond partial states") {
    val p = plan("q6_revenue_delta")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("IsNotNull(l_discount)") || p.contains("GreaterThanOrEqual(l_discount"), p)
    assert(!p.contains("Join"), p) // no join operator of any kind
  }

  test("q7/q8 keep every dimension broadcast — the only shuffle is fact⋈fact on orderkey") {
    for (q <- Seq("q7_volume_shipping", "q8_market_share")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q15 argmax is a 1-row broadcast equi-join on the rounded revenue, not a global re-sort") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q4 priority mix is a left-semi equi-join, never a pair expansion") {
    val p = plan("q4_priority_returns")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q22 threshold is the benign 1-row scalar broadcast; the lapsed screen is an anti equi-join") {
    val p = plan("q22_idle_balance")
    assert(p.contains("LeftAnti"), p)
    // exactly one BNLJ — the 1-row threshold frame
    assert(p.split("BroadcastNestedLoopJoin").length - 1 == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q2/q9/q20 derived-partsupp chains stay broadcast-dimensional — no pair expansion") {
    for (q <- Seq("q2_min_cost_supplier", "q9_product_profit", "q20_dominant_suppliers")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q11 grand total is the benign 1-row scalar broadcast over a catalog-sized frame") {
    val p = plan("q11_important_parts")
    assert(p.split("BroadcastNestedLoopJoin").length - 1 == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q12/q16 are equi-joins with partial aggregation — no BNLJ anywhere") {
    for (q <- Seq("q12_priority_lines", "q16_supplier_variety")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q21 folds EXISTS/NOT-EXISTS into one per-order aggregate riding the semi-join's partitioning") {
    val p = plan("q21_sole_blame")
    // the one fact-fact exchange is the orderkey semi-join's; the
    // per-order aggregate reuses that hash partitioning, so no
    // LeftAnti and no second lineitem-sized exchange appear
    assert(p.contains("LeftSemi") && !p.contains("LeftAnti"), p)
    assert(p.split("Exchange hashpartitioning\\(l_orderkey").length - 1 <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed co-located join: merge join fed by bucketed scans, exchange only at the final agg") {
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // both scans read the bucketed layout…
    assert(p.split("SelectedBucketsCount").length - 1 == 2, p)
    // …and neither side shuffles before the join: the single exchange
    // in the whole plan is the final groupBy's
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("bucketed pre-aggregation: the fact-sized per-key count runs exchange-free") {
    val p = plan("q_bucketed_agg")
    assert(p.contains("SelectedBucketsCount"), p)
    // the only exchange is the tiny histogram re-aggregation's
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("partition-pruned layout: the point query's filter prunes PARTITIONS, not just row groups") {
    val p = plan("q_partition_prune")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("purchase"), p)
  }

  test("reservoir cap is a bounded k-minima aggregate + broadcast threshold — never a per-source sort") {
    val p = plan("pipeline_reservoir_cap")
    assert(p.contains("ObjectHashAggregate"), p) // the KMV TypedImperativeAggregate, map-combined
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p) // the oracle's row_number is the replica, not the plan
  }

  test("RAKE is vocab-keyed equi-joins + TakeOrdered — no pair expansion, no global sort") {
    val p = plan("text_rake_keywords")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("skew report is one exploded scan + census aggregates — no ranking window, no pair join") {
    val p = plan("q_skew_report")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the counts frame feeds both the probe side and the totals build
    // side; statically that is two identical scan+aggregate subtrees,
    // and AQE's exchange reuse must collapse them at runtime so the
    // fact table is scanned ONCE — assert on the executed final plan
    val df = SparkEntry.queries("q_skew_report")(spark, sf0001)
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("ReusedExchange"), exec)
  }

  test("referential-integrity audit: every orphan probe is a broadcast anti-join") {
    val p = plan("q_referential_integrity")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // parents are dim-sized — never shuffle the child
    assert(!p.contains("CartesianProduct"), p)
  }

  test("DAU/MAU joins its calendar-sized weekly/monthly frames broadcast") {
    val p = plan("q_dau_mau")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
