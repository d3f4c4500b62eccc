package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}

/** Idempotent upsert sinks — the Spark form of the reference's X1–X3
  * sink family (SURVEY.md §2).
  *
  * The reference's most elaborate code is a 274-line write-ahead sink
  * that buffers rows per checkpoint and publishes on
  * `notifyCheckpointComplete` (sink/SinkDataApiTumbling.java:88–194).
  * Under Structured Streaming that machinery is engine-provided:
  * `foreachBatch` runs under the streaming commit log, replayed batches
  * re-run with the same epochId, and **idempotent upsert keyed on the
  * window key makes replays harmless** — exactly-once to the target
  * without a WAL. The upsert key (key, window_start, window_end)
  * matches the reference's `tumbling_pkey` (reference README.MD:88).
  */
object UpsertSink {

  /** Tiny keyed KV store standing in for the external database in tests
    * and local demos (local mode = executors share the JVM). Thread-safe:
    * partition tasks write concurrently.
    */
  object InMemoryStore {
    private val tables = TrieMap[String, TrieMap[Seq[Any], Seq[Any]]]()
    def upsert(table: String, key: Seq[Any], value: Seq[Any]): Unit =
      tables.getOrElseUpdate(table, TrieMap.empty).put(key, value)
    def snapshot(table: String): Map[Seq[Any], Seq[Any]] =
      tables.getOrElse(table, TrieMap.empty).toMap
    def size(table: String): Int = tables.get(table).map(_.size).getOrElse(0)
    def clear(table: String): Unit = tables.remove(table)
  }

  /** `foreachBatch` body: executor-side, partition-parallel, batched
    * upsert (threshold batching mirrors the reference's sink buffers —
    * sink/SinkDataApiBatch.java:61 — though here a batch is just an
    * amortization unit, not a correctness device).
    *
    * Usage:
    * {{{
    * df.writeStream.outputMode("update")
    *   .foreachBatch(UpsertSink.foreachBatchUpsert("tumbling", Seq("key", "window_start", "window_end")) _)
    *   .option("checkpointLocation", dir).start()
    * }}}
    */
  def foreachBatchUpsert(table: String, keyCols: Seq[String], batchSize: Int = 100)(
      df: DataFrame, epochId: Long): Unit = {
    val cols = df.columns.toSeq
    val keyIdx = keyCols.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"key columns $keyCols not all in $cols")
    df.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(batchSize).foreach { batch =>
        batch.foreach { r =>
          InMemoryStore.upsert(table, keyIdx.map(r.get), r.toSeq.map(identity))
        }
      }
    }
  }

  /** SQL text for the production JDBC path — the reference's
    * `INSERT … ON CONFLICT … DO UPDATE` built by String.format
    * (sink/SinkDataApiSingle.java:56–60), parameterized instead of
    * string-spliced. Executed via standard addBatch/executeBatch from
    * `foreachPartition`; no database ships in this container, so the
    * text is unit-tested and the in-memory store stands in end-to-end.
    */
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val updates = cols.filterNot(keyCols.contains).map(c => s"$c = EXCLUDED.$c")
    val conflictAction =
      if (updates.isEmpty) "DO NOTHING" // all columns are key columns
      else s"DO UPDATE SET ${updates.mkString(", ")}"
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $conflictAction"
  }
}
