package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Windows
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the north-star
  * training-data-pipeline extensions) is registered in [[queries]]; each
  * SQL-expressible one has a DuckDB oracle in [[oracleSql]] with
  * matching output column names.
  */
object SparkEntry {

  /** Flagship query — the reference's documented default job
    * (StreamJobSqlTumbling, reference README.MD:111): tumbling
    * event-time count per class. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Windows.tumblingCount(
      Tables.load(spark, "/root/testdata/sf0.001", "events"),
      col("ts"), col("event_type"), "1 minute")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ RelationalQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ RelationalQueries.oracles ++
      DedupQueries.oracles ++ TextQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles

  /** Scaled-decade (sf1+) oracle overrides: same queries and threshold
    * arithmetic as [[oracleSql]], with the O(n²) brute pair scans
    * re-expressed on an inverted-index join so DuckDB stays feasible at
    * 50 k+ documents (see [[DedupQueries.scaledOracles]]). Consumed by
    * tools/scaled_compare.py only — the driver's sf0.01 gate keeps the
    * brute formulation. */
  def scaledOracleSql: Map[String, String] = DedupQueries.scaledOracles
}
