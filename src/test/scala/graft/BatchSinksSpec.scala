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

  test("approximate distinct (HLL) lands within 5% of exact at sf0.001") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val (approx, exact) = li
      .agg(approx_count_distinct($"l_partkey").as("a"), countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
