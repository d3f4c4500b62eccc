package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch output writers for the training-data pipeline side of the
  * engine. The reference's only sink is the DB upsert (X1–X3, covered
  * by [[graft.streaming.UpsertSink]]); a 100 TB corpus pipeline also
  * needs layout-aware bulk writers:
  *
  *  - date-partitioned parquet: directory pruning for downstream
  *    time-range scans (`PartitionFilters` instead of reading
  *    everything) — including DYNAMIC partition pruning when the kept
  *    partitions only emerge from a dimension-side filter at runtime
  *    (the star-schema scan pattern; BatchSinksSpec pins the
  *    `dynamicpruning` subquery in the fact scan);
  *  - sized output files: `repartition(n)` before write controls file
  *    count, avoiding the small-files problem that kills object-store
  *    listings at scale.
  */
object BatchSinks {

  /** Write `df` as parquet partitioned by the date of `tsCol`.
    * `filesPerPartition` bounds output file count per date directory.
    */
  def writeDatePartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      filesPerPartition: Int = 1): Unit =
    // salt within the date so a hot date splits across up to
    // filesPerPartition tasks (repartitioning by dt alone would funnel
    // each date — and with 1 partition, the whole dataset — through a
    // single task); files per dt directory stay ≤ filesPerPartition
    df.withColumn("dt", to_date(col(tsCol)))
      .withColumn("_salt", pmod(hash(col(tsCol)), lit(filesPerPartition)))
      .repartition(col("dt"), col("_salt"))
      .drop("_salt")
      .write
      .mode("overwrite")
      .partitionBy("dt")
      .parquet(path)

  /** Read back a date-partitioned dataset with a pruning filter — the
    * scan must show PartitionFilters, not a full-directory read. */
  def readDateRange(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      fromDate: String,
      toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("dt") >= lit(fromDate) && col("dt") <= lit(toDate))

  /** Write `df` as a BUCKETED table: rows hash-partitioned on
    * `bucketCol` into `buckets` files per partition, with the bucketing
    * recorded in the catalog. Two tables bucketed the same way join
    * WITHOUT a shuffle — the co-located-join layout that makes repeated
    * fact-to-fact joins affordable at 100 TB: the one-off shuffle is
    * paid at write time, every subsequent join is exchange-free
    * (asserted in BatchSinksSpec). `sortBy` the same column so the
    * join is a zip-merge within each bucket pair.
    */
  def writeBucketed(
      df: DataFrame,
      bucketCol: String,
      buckets: Int,
      table: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Interchange formats: parquet is the engine's native layout, but a
    * corpus pipeline also exports to/ingests from ORC (the other
    * columnar with pushdown + pruning), JSON lines, and CSV. The writer
    * is format-agnostic; [[readInterchange]] re-applies the schema
    * explicitly because text formats carry none (CSV) or only
    * inferrable (JSON) types — round-trip fidelity is asserted in
    * BatchSinksSpec, including quoting/escaping on the text formats.
    */
  def writeInterchange(df: DataFrame, path: String, format: String): Unit =
    df.write.mode("overwrite").format(format)
      .option("compression", if (format == "csv" || format == "json") "gzip" else "zstd")
      .option("header", "true")  // csv only; others ignore
      .option("escape", "\"")    // RFC 4180: quotes double inside quoted fields
      .save(path)

  /** Schema-explicit read of an interchange export (see
    * [[writeInterchange]]). `multiLine` lets quoted CSV fields span
    * newlines — NOTE this makes a csv file unsplittable (one task per
    * file); exports whose text columns can embed newlines should
    * prefer json/orc when the read side must parallelize within files.
    */
  def readInterchange(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      format: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val reader = spark.read.format(format)
      .schema(schema)
      .option("header", "true")
      .option("escape", "\"")
    // CSV-only: quoted fields spanning newlines. For JSON, multiLine
    // means "one document per file" and would drop all but the first
    // record of a JSON-lines export.
    (if (format == "csv") reader.option("multiLine", "true") else reader)
      .load(path)
  }
}
