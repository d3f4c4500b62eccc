package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sink.BatchSinks

class BatchSinksSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write round-trips and prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val events = Tables.load(spark, sf0001, "events")
    BatchSinks.writeDatePartitioned(events, "ts", out)

    // layout: one directory per date
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("dt=")) && dirs.length > 1)

    // full round-trip preserves rows
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())

    // pruned read: PartitionFilters in the scan, fewer rows
    val ranged = BatchSinks.readDateRange(spark, out, "2024-01-05", "2024-01-06")
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("dt"), plan)
    val expected = events.filter(to_date($"ts").between("2024-01-05", "2024-01-06")).count()
    assert(ranged.count() == expected && expected > 0)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the star-schema 100 TB pattern the static range read can't
    // cover: the kept dates aren't known until the dimension filter
    // runs, so the fact scan must receive its partition list at
    // RUNTIME (a dynamicpruning subquery on dt), not read everything
    // and filter after the join
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val events = Tables.load(spark, sf0001, "events")
    BatchSinks.writeDatePartitioned(events, "ts", out)
    val fact = spark.read.parquet(out)
    val dates = fact.select($"dt".cast("string")).distinct().as[String].collect().sorted
    assert(dates.length > 1)
    // the dim must be a real scan with the filter still in the plan —
    // a pre-filtered local relation carries no selective predicate, so
    // the optimizer would (correctly) see nothing to prune WITH
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    dates.zipWithIndex.toSeq
      .map { case (d, i) => (d, if (i % 2 == 0) "keep" else "drop") }
      .toDF("dts", "tag").select($"dts".cast("date").as("dt"), $"tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")
    val joined = fact.join(dim, "dt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"fact scan not dynamically pruned: $plan")
    val keepSet = dates.zipWithIndex.collect { case (d, i) if i % 2 == 0 => d }.toSet
    val expected = events.filter(to_date($"ts").cast("string").isInCollection(keepSet)).count()
    assert(joined.count() == expected && expected > 0)
  }

  test("bucketed tables join co-located — no shuffle exchange in the join") {
    // warehouse dir is a static conf — tables land in the default
    // ./spark-warehouse (gitignored) and are dropped below
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    BatchSinks.writeBucketed(
      Tables.load(spark, sf0001, "orders"), "o_orderkey", 4, "b_orders")
    BatchSinks.writeBucketed(
      Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_extendedprice"), "l_orderkey", 4, "b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    // disable auto-broadcast so the test proves BUCKETING (not
    // broadcasting) removed the exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles: $plan")
      // and the join is correct
      val expect = Tables.load(spark, sf0001, "lineitem")
        .join(Tables.load(spark, sf0001, "orders"), $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expect && expect > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("approximate distinct (HLL) lands within 5% of exact at sf0.001") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val (approx, exact) = li
      .agg(approx_count_distinct($"l_partkey").as("a"), countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("interchange formats round-trip the documents table losslessly") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text", "n_chars")
    // a row with CSV-hostile content exercises quoting/escaping
    val hostile = docs.limit(0).union(
      Seq((-1L, "s,rc\"x", "line one\nline \"two\", comma", 25L))
        .toDF("doc_id", "source", "text", "n_chars"))
    val all = docs.union(hostile)
    Seq("orc", "json", "csv").foreach { fmt =>
      val path = java.nio.file.Files.createTempDirectory(s"graft_interchange_$fmt").toString + "/out"
      graft.sink.BatchSinks.writeInterchange(all, path, fmt)
      val back = graft.sink.BatchSinks.readInterchange(spark, path, fmt, all.schema)
      assert(back.schema == all.schema, s"$fmt schema drift")
      assert(back.exceptAll(all).isEmpty && all.exceptAll(back).isEmpty,
        s"$fmt round-trip mismatch")
    }
  }

  test("approximate percentile sketch brackets the exact histogram median") {
    // the sketch path for quantiles at scale (one pass, mergeable
    // state); the exact path is q_median_price's histogram plan.
    // approx_percentile's accuracy parameter bounds the RANK error,
    // so compare by position: the approximate median's rank must be
    // within n/accuracy of the true middle.
    val li = Tables.load(spark, sf0001, "lineitem")
    val accuracy = 1000
    val approxMedian = li
      .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(accuracy)))
      .as[Double].collect()(0)
    val n = li.count()
    val below = li.filter($"l_extendedprice" <= approxMedian).count()
    val rankErr = math.abs(below - n / 2.0)
    assert(rankErr <= n.toDouble / accuracy + 1,
      s"approx median $approxMedian at rank $below of $n (err $rankErr)")
  }
}
