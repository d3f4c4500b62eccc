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
      Multimodal.MediaPipeline.audioFeatures(s, Tables.load(s, dir, "documents"), bias = 64).toDF()),

    // perceptual near-dup over media payloads: average-hash signature
    // (56 resampled bytes, bit = above-mean; FakeCodec.ahashBatch) →
    // pairs within Hamming distance 3 — the image-dedup stage of a
    // multimodal pipeline (re-encoded/resized copies keep their aHash;
    // exact dedup on bytes structurally cannot see them). Candidate
    // generation is the SAME scale-safe shape as dedup_simhash:
    // pigeonhole banding over DISTINCT signatures (ham ≤ 3 ⇒ at least
    // one of 4 14-bit blocks equal — exact, not probabilistic), 4
    // equi-joins, each surviving pair kept only at its first equal
    // block (no distinct() shuffle), xor+popcount verify, then pure
    // materialization back to media ids. No all-pairs stage exists at
    // any scale.
    "multimodal_ahash_dedup" -> ((s, dir) => {
      def blockBits(c: org.apache.spark.sql.Column, i: Int) =
        shiftrightunsigned(c, i * 14).bitwiseAND(lit((1L << 14) - 1))
      // six plan branches reference the signature frame (banding a/b,
      // pair expansion ×2, same-sig ×2) — persist so the codec pass
      // over the payloads runs once, not per branch (same reason the
      // PQ code index persists in adcShortlist)
      val d = Multimodal.MediaPipeline
        .perceptualHashes(s, Tables.load(s, dir, "documents"), samples = 56)
        .toDF()
        .persist()
      val sigs = d.select("ahash").distinct()
      val blocks = array((0 until 4).map { i =>
        struct(lit(i).as("blk"), blockBits(col("ahash"), i).as("bits"))
      }: _*)
      val banded = sigs
        .select(col("ahash"), explode(blocks).as("b"))
        .select(col("ahash"), col("b.blk").as("blk"), col("b.bits").as("bits"))
      val a = banded.select(col("blk"), col("bits"), col("ahash").as("sha"))
      val b = banded.select(col("blk"), col("bits"), col("ahash").as("shb"))
      val firstEqualBlock = (0 until 4).foldRight(lit(-1)) { (i, acc) =>
        when(blockBits(col("sha"), i) === blockBits(col("shb"), i), lit(i)).otherwise(acc)
      }
      val sigPairs = a.join(b, Seq("blk", "bits"))
        .filter(col("sha") < col("shb"))
        .filter(col("blk") === firstEqualBlock)
        .withColumn("ham", graft.functions.TextFunctions.hamming(col("sha"), col("shb")))
        .filter(col("ham") <= 3)
        .select("sha", "shb", "ham")
      val da = d.select(col("media_id").as("ida"), col("ahash").as("sha"))
      val db = d.select(col("media_id").as("idb"), col("ahash").as("shb"))
      val cross = sigPairs
        .join(da, "sha").join(db, "shb")
        .select(least(col("ida"), col("idb")).as("media_a"),
          greatest(col("ida"), col("idb")).as("media_b"), col("ham"))
      val same = d.select(col("media_id").as("ida"), col("ahash"))
        .join(d.select(col("media_id").as("idb"), col("ahash")), "ahash")
        .filter(col("ida") < col("idb"))
        .select(col("ida").as("media_a"), col("idb").as("media_b"), lit(0L).as("ham"))
      cross.unionByName(same)
    }),

    // near-duplicate VIDEO detection: two payloads are near-dups when
    // they share ≥ 2 identical sampled-frame fingerprints — clipped /
    // re-muxed copies keep most frames bit-identical while the
    // container bytes (and so exact dedup) differ. Same inverted-index
    // shape as dedup_common_spans: explode frames, self-join per
    // fingerprint (each fp's pair fan-out is its frequency², bounded
    // by the hottest frame, never |corpus|²), count shared frames per
    // pair. DISTINCT frames per video first — a frame repeated within
    // one video must not inflate the pair's shared count.
    "multimodal_video_neardup" -> ((s, dir) => {
      // both sides of the self-join scan the frame index — persist so
      // the codec pass and the distinct shuffle run once, not twice
      val frames = Multimodal.MediaPipeline
        .frameSamples(s, Tables.load(s, dir, "documents"), frameLen = 32, stride = 2)
        .toDF()
        .select(col("media_id"), col("frame_fp")).distinct()
        .persist()
      val a = frames.select(col("media_id").as("media_a"), col("frame_fp"))
      val b = frames.select(col("media_id").as("media_b"), col("frame_fp"))
      a.join(b, Seq("frame_fp"))
        .filter(col("media_a") < col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(count(lit(1)).as("shared_frames"))
        .filter(col("shared_frames") >= 2)
    })
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
        |FROM documents""".stripMargin,

    // signature replicated byte-for-byte: sample i of 56 reads byte
    // ⌊i·n/56⌋ (= 1-based character i·n//56 + 1), bit set iff
    // 56·sample > Σsamples (strict, integer); pow(2,i) is a power of
    // two, exactly representable as DOUBLE for all i < 63. Brute-force
    // pairing is fine at oracle scale; the engine's banding is
    // recall-exact by pigeonhole so the outputs coincide.
    "multimodal_ahash_dedup" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE length(text) > 0),
        |v AS (
        |  SELECT media_id,
        |         list_transform(range(0, 56),
        |           i -> CAST(ascii(substring(text, CAST(i * n // 56 AS INTEGER) + 1, 1)) AS BIGINT)) AS vs
        |  FROM d),
        |sg AS (
        |  SELECT media_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(0, 56), i ->
        |             CASE WHEN 56 * vs[CAST(i AS INTEGER) + 1]
        |                       > list_reduce(vs, (a, b) -> a + b)
        |                  THEN CAST(pow(2, i) AS BIGINT)
        |                  ELSE CAST(0 AS BIGINT) END)),
        |           (x, y) -> x + y) AS sig
        |  FROM v)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS ham
        |FROM sg a JOIN sg b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    // same frame grid + fingerprint arithmetic as multimodal_frame_sample,
    // deduped per video before pairing
    "multimodal_video_neardup" ->
      """WITH fr AS (
        |  SELECT DISTINCT doc_id AS media_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(substring(text, CAST(i*32+1 AS INTEGER), 32), ''),
        |             c -> CAST(ascii(c) AS BIGINT))),
        |           (h, c) -> (h * 31 + c) % 2147483647) AS frame_fp
        |  FROM documents, UNNEST(range(0, (length(text)+31)//32)) AS t(i)
        |  WHERE i % 2 = 0)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(count(*) AS BIGINT) AS shared_frames
        |FROM fr a JOIN fr b ON a.frame_fp = b.frame_fp AND a.media_id < b.media_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin
  )
}
