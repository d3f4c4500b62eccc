package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.multimodal.Multimodal

/** Multimodal decode pipeline registered as a query. The payloads are
  * ASCII text bytes (harness stand-in), so every byte-level feature the
  * FakeCodec computes is reproducible in the DuckDB oracle via
  * character arithmetic — the whole mapPartitions pipeline, schema and
  * batching included, is correctness-gated, not just smoke-tested.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.MediaPipeline.features(s, Tables.load(s, dir, "documents")).toDF()),

    // nearest-neighbor resize to an 8×6 grid — the resample stage of an
    // image pipeline, batch-amortized like decode; byte-arithmetic
    // oracle over the sampled positions
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.MediaPipeline.resized(s, Tables.load(s, dir, "documents"), w = 8, h = 6).toDF())
  )

  val oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |       CAST(length(text) AS BIGINT) AS byte_len,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |              list_transform(string_split(substring(text, 1, 16), ''), c -> CAST(ascii(c) AS BIGINT))),
        |            (a, b) -> a + b) AS BIGINT) AS header_sum,
        |       CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS frame0,
        |       CAST(ascii(substring(text, length(text) // 2 + 1, 1)) AS BIGINT) AS frame_mid,
        |       CAST(ascii(substring(text, length(text), 1)) AS BIGINT) AS frame_last,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM documents""".stripMargin,

    // sample i of 48 reads byte floor(i*n/48) (0-based) = character
    // i*n//48 + 1 (1-based); ASCII payloads make byte == character
    "multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |       CAST(8 AS INTEGER) AS out_w, CAST(6 AS INTEGER) AS out_h,
        |       CAST(CASE WHEN length(text) = 0 THEN 0 ELSE 48 END AS BIGINT) AS out_len,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(range(0, CASE WHEN length(text) = 0 THEN 0 ELSE 48 END),
        |           i -> CAST(ascii(substring(text, CAST(i * length(text) // 48 AS INTEGER) + 1, 1)) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 2147483647) AS fp_resized
        |FROM documents""".stripMargin
  )
}
