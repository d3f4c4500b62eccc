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
      Multimodal.MediaPipeline.resized(s, Tables.load(s, dir, "documents"), w = 8, h = 6).toDF()),

    // temporal frame sampling — payload cut into 32-byte "frames",
    // every 2nd frame emitted (one→many explode shape, the "1 fps for
    // the vision encoder" stage); fingerprints oracle-checked per frame
    "multimodal_frame_sample" -> ((s, dir) =>
      Multimodal.MediaPipeline.frameSamples(s, Tables.load(s, dir, "documents"), frameLen = 32, stride = 2).toDF()),

    // audio feature extraction — payload read as unsigned 8-bit PCM
    // biased at 64 (ASCII: spaces/digits negative, letters positive);
    // amplitude sums, peak, and zero-crossings are integer-exact
    "multimodal_audio_features" -> ((s, dir) =>
      Multimodal.MediaPipeline.audioFeatures(s, Tables.load(s, dir, "documents"), bias = 64).toDF())
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
        |FROM documents""".stripMargin,

    // lateral range-unnest replicates the frame grid; ASCII payloads
    // make byte == character so substring arithmetic is byte-exact
    "multimodal_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       CAST(i AS INTEGER) AS frame_idx,
        |       CAST(i*32 AS BIGINT) AS frame_off,
        |       CAST(least(32, length(text) - i*32) AS BIGINT) AS frame_len,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(substring(text, CAST(i*32+1 AS INTEGER), 32), ''),
        |           c -> CAST(ascii(c) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 2147483647) AS frame_fp
        |FROM documents, UNNEST(range(0, (length(text)+31)//32)) AS t(i)
        |WHERE i % 2 = 0""".stripMargin,

    "multimodal_audio_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(length(text) AS BIGINT) AS n_samples,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text,''), c -> CAST(abs(ascii(c) - 64) AS BIGINT))),
        |         (a,b) -> a+b) AS BIGINT) AS sum_amp,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text,''), c -> CAST(abs(ascii(c) - 64) AS BIGINT))),
        |         (a,b) -> greatest(a,b)) AS BIGINT) AS peak_amp,
        |       CAST(len(list_filter(range(1, length(text)),
        |         i -> (ascii(substring(text, CAST(i AS INTEGER), 1)) - 64) * (ascii(substring(text, CAST(i+1 AS INTEGER), 1)) - 64) < 0)) AS BIGINT) AS zero_crossings
        |FROM documents""".stripMargin
  )
}
