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
  *    everything);
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
}
