package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The Spark-side machinery here is real and tested — schema, typed
  * Dataset encoders, partition-level batching (the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch shape), deterministic output. Only
  * the innermost codec call is a stub ([[FakeCodec]]): the container
  * has no image/audio libraries, so the "decode" computes deterministic
  * features of the raw bytes. Swapping in a real codec changes one
  * function, not the pipeline.
  *
  * Scale notes: `mapPartitions` keeps the codec call amortized (one
  * codec context per batch of [[MediaPipeline.BatchSize]] records, like
  * a Pandas UDF's Arrow batches); records never pass through the
  * driver; binary payloads stay columnar until the decode boundary.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      modality: String,
      data: Array[Byte],
      mime: String,
      declared_w: Int,
      declared_h: Int)

  /** Extracted features (deterministic under [[FakeCodec]]). */
  case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      header_sum: Long,
      frame0: Long,
      frame_mid: Long,
      frame_last: Long,
      fp: Long)

  /** The stubbed codec boundary. A production build replaces this
    * object with JNI/javacv bindings; everything else is unchanged.
    */
  object FakeCodec {
    /** Batch-call counter (test observability: proves the pipeline
      * calls the codec per batch, not per record; local mode shares the
      * JVM so executor-side increments are visible to the test). */
    val batchCalls = new java.util.concurrent.atomic.AtomicLong()

    /** "Decode" a batch: deterministic features over raw bytes —
      * header checksum (first 16 bytes), three "frame samples" (byte at
      * 0, mid, last), and a 31-bit polynomial fingerprint of the whole
      * payload. Batch-shaped on purpose: one call per batch, not per
      * record.
      */
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
      batchCalls.incrementAndGet()
      batch.map { r =>
        val bs = r.data
        val n = bs.length
        def at(i: Int): Long = if (n == 0) 0L else java.lang.Byte.toUnsignedLong(bs(i))
        val header = bs.take(16).map(java.lang.Byte.toUnsignedLong).sum
        var fp = 0L
        var i = 0
        while (i < n) { fp = (fp * 31 + java.lang.Byte.toUnsignedLong(bs(i))) % 2147483647L; i += 1 }
        MediaFeatures(r.media_id, n.toLong, header, at(0), at(n / 2), at(math.max(0, n - 1)), fp)
      }
    }

    /** Temporal frame sampling of a "video" payload: the byte stream is
      * cut into fixed-`frameLen` frames and every `stride`-th frame is
      * emitted with its offset, actual length (the tail frame may be
      * short) and polynomial fingerprint — the classic "sample 1 fps
      * for a vision encoder" stage. One→many (explode-shaped), still
      * one codec call per batch.
      */
    def frameSampleBatch(batch: Seq[MediaRecord], frameLen: Int, stride: Int): Seq[SampledFrame] = {
      batchCalls.incrementAndGet()
      batch.flatMap { r =>
        val bs = r.data
        val n = bs.length
        val nFrames = (n + frameLen - 1) / frameLen
        (0 until nFrames).by(stride).map { f =>
          val off = f * frameLen
          val len = math.min(frameLen, n - off)
          var fp = 0L
          var i = off
          while (i < off + len) { fp = (fp * 31 + java.lang.Byte.toUnsignedLong(bs(i))) % 2147483647L; i += 1 }
          SampledFrame(r.media_id, f, off.toLong, len.toLong, fp)
        }
      }
    }

    /** "Audio" feature extraction: the payload is read as unsigned
      * 8-bit PCM biased at `bias` (64 for the ASCII harness payloads —
      * spaces/digits swing negative, letters positive, so crossings
      * land on word boundaries). Emits per-record sample count, total
      * absolute amplitude, peak amplitude, and zero-crossing count —
      * all integer arithmetic, reproducible in the oracle.
      */
    def audioFeatureBatch(batch: Seq[MediaRecord], bias: Int): Seq[AudioFeatures] = {
      batchCalls.incrementAndGet()
      batch.map { r =>
        val bs = r.data
        val n = bs.length
        var sumAmp = 0L
        var peak = 0L
        var crossings = 0L
        var prev = 0L
        var i = 0
        while (i < n) {
          val v = java.lang.Byte.toUnsignedLong(bs(i)) - bias
          val a = math.abs(v)
          sumAmp += a
          if (a > peak) peak = a
          if (i > 0 && prev * v < 0) crossings += 1
          prev = v
          i += 1
        }
        AudioFeatures(r.media_id, n.toLong, sumAmp, peak, crossings)
      }
    }

    /** "Resize" a batch to a w×h grid: nearest-neighbor subsample of
      * the payload bytes (sample i of w·h reads byte ⌊i·n/(w·h)⌋), then
      * fingerprint the resampled bytes. Same batch-amortized shape as
      * [[decodeBatch]]; a real build swaps in an image scaler, the
      * pipeline (schema, batching, determinism) is unchanged.
      */
    def resizeBatch(batch: Seq[MediaRecord], w: Int, h: Int): Seq[ResizedMedia] = {
      batchCalls.incrementAndGet()
      val out = w * h
      batch.map { r =>
        val bs = r.data
        val n = bs.length
        var fp = 0L
        var i = 0
        while (i < out && n > 0) {
          val b = java.lang.Byte.toUnsignedLong(bs((i.toLong * n / out).toInt))
          fp = (fp * 31 + b) % 2147483647L
          i += 1
        }
        ResizedMedia(r.media_id, w, h, if (n == 0) 0L else out.toLong, fp)
      }
    }

    /** Average-hash perceptual signature: resample the payload to
      * `samples` bytes (the same nearest-neighbor grid as
      * [[resizeBatch]]), then set bit i iff sample i is strictly above
      * the resampled mean — compared as `samples·vᵢ > Σv`, pure integer
      * arithmetic, no division. `samples` ≤ 62 keeps the signature in a
      * positive signed long. Empty payloads have no signal and are
      * skipped. A real build computes this over decoded pixels; the
      * signature→near-dup plumbing downstream is codec-independent.
      */
    def ahashBatch(batch: Seq[MediaRecord], samples: Int): Seq[MediaHash] = {
      require(samples > 0 && samples <= 62, s"samples must be in [1, 62]: $samples")
      batchCalls.incrementAndGet()
      batch.flatMap { r =>
        val bs = r.data
        val n = bs.length
        if (n == 0) None
        else {
          val v = Array.tabulate(samples)(i => java.lang.Byte.toUnsignedLong(bs((i.toLong * n / samples).toInt)))
          val total = v.sum
          var sig = 0L
          var i = 0
          while (i < samples) {
            if (samples * v(i) > total) sig |= (1L << i)
            i += 1
          }
          Some(MediaHash(r.media_id, sig))
        }
      }
    }

    /** 8×8 DCT-II basis at fixed-point scale 2¹³, row-major:
      * `DctCos(8u + x) = round(cos(π(2x+1)u/16) · 8192)`. A LITERAL
      * table (not computed at runtime) so the DuckDB oracle embeds the
      * identical integers and the signatures replay bit-for-bit. */
    val DctCos: Array[Long] = Array(
      8192L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L,
      8035L, 6811L, 4551L, 1598L, -1598L, -4551L, -6811L, -8035L,
      7568L, 3135L, -3135L, -7568L, -7568L, -3135L, 3135L, 7568L,
      6811L, -1598L, -8035L, -4551L, 4551L, 8035L, 1598L, -6811L,
      5793L, -5793L, -5793L, 5793L, 5793L, -5793L, -5793L, 5793L,
      4551L, -8035L, 1598L, 6811L, -6811L, -1598L, 8035L, -4551L,
      3135L, -7568L, 7568L, -3135L, -3135L, 7568L, -7568L, 3135L,
      1598L, -4551L, 6811L, -8035L, 8035L, -6811L, 4551L, -1598L)

    /** "Decode" a batch to a side×side luma grid — the codec-contract
      * method a real build implements with an image decoder + scaler.
      * The fake format: pixel bytes run up to the first 0x00, which
      * opens an ignored container trailer (encoder metadata, padding —
      * what a real decoder discards); luma is the unsigned pixel byte,
      * nearest-neighbor-resampled to the grid. Stripping the trailer
      * is what makes the decoded path RE-ENCODE INVARIANT: two
      * encodings of the same pixel stream (different trailers) decode
      * to the identical grid, so every downstream signature agrees —
      * MultimodalSpec pins it. Records with an empty pixel section
      * carry no signal and are skipped. */
    def decodeLumaBatch(batch: Seq[MediaRecord], side: Int = 32): Seq[MediaLuma] = {
      batchCalls.incrementAndGet()
      val out = side * side
      batch.flatMap { r =>
        val bs = r.data
        var m = 0
        while (m < bs.length && bs(m) != 0) m += 1
        if (m == 0) None
        else Some(MediaLuma(r.media_id, Array.tabulate(out)(k =>
          java.lang.Byte.toUnsignedLong(bs((k.toLong * m / out).toInt)))))
      }
    }

    /** pHash (DCT perceptual hash) over the DECODED 32×32 luma grid
      * ([[decodeLumaBatch]]): the grid is average-pooled 4×4 → an 8×8
      * matrix of cell SUMS (dividing by 16 would scale every
      * coefficient equally and move no bit, so the integer sums stay
      * exact) → 2-D fixed-point DCT-II → the 63 coefficients of the
      * full 8×8 block (u, w ∈ [0,8)² with DC dropped — DC is mean
      * brightness, which pHash deliberately ignores) → bit i =
      * coefficient above the median of the 63. This is the CLASSIC
      * 64-bit pHash shape (drop-DC variant); the original 15-bit
      * [0,4)² form hit its birthday floor at corpus scale — 500 k
      * media over 2¹⁵ signatures force ~15 media per signature however
      * dissimilar the images, so the ham ≤ 2 pair OUTPUT grew
      * quadratically by pigeonhole, not by similarity (measured: 60×
      * time for 10× data at sf10, round 13). At 2⁶³ the only
      * collisions left are true near-dups. DCT magnitude
      * structure survives the re-encode / resize / brightness shifts
      * that flip aHash's per-point bits — and because the transform
      * now runs on the decoded grid, trailer-only re-encodes are
      * bit-identical by construction. Every step is integer
      * arithmetic on the literal [[DctCos]] table, so the oracle
      * replays signatures exactly.
      *
      * Oracle parity note: the DuckDB oracle samples CHARACTERS
      * (`ascii(substring(…))`) while this side samples payload BYTES,
      * and it takes the whole text as the pixel section — both hold
      * on this corpus because the harness payloads are ASCII with no
      * NUL (byte == character, trailer absent). The spec proves the
      * trailer/decode behavior on synthetic payloads where they DO
      * diverge. */
    def phashBatch(batch: Seq[MediaRecord]): Seq[MediaPHash] = {
      decodeLumaBatch(batch).map { lr =>
        val luma = lr.luma
        val v = Array.tabulate(64) { k =>
          val r0 = (k / 8) * 4
          val c0 = (k % 8) * 4
          var s = 0L
          var i = 0
          while (i < 16) { s += luma((r0 + i / 4) * 32 + c0 + i % 4); i += 1 }
          s
        }
        val coef = (for {
          u <- 0 until 8; w <- 0 until 8 if u != 0 || w != 0
        } yield {
          var sum = 0L
          var k = 0
          while (k < 64) {
            sum += v(k) * DctCos(8 * u + k / 8) * DctCos(8 * w + k % 8)
            k += 1
          }
          sum
        }).toArray
        val med = coef.sorted.apply(31) // true median of the 63
        var sig = 0L
        var i = 0
        while (i < 63) {
          if (coef(i) > med) sig |= (1L << i)
          i += 1
        }
        MediaPHash(lr.media_id, sig)
      }
    }
  }

  object MediaPipeline {
    val BatchSize = 64

    /** documents → opaque media table (harness stand-in: UTF-8 payload
      * plays the image bytes; metadata is arbitrary but typed). */
    def mediaFromDocuments(docs: DataFrame): DataFrame =
      docs.select(
        col("doc_id").as("media_id"),
        lit("image").as("modality"),
        col("text").cast("binary").as("data"),
        lit("image/x-fake").as("mime"),
        (col("n_chars") % 64 + 1).cast("int").as("declared_w"),
        (col("n_chars") % 48 + 1).cast("int").as("declared_h"))

    /** The batched decode stage: partition-local, codec called once per
      * [[BatchSize]] records. */
    def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.decodeBatch(g))
      }
    }

    /** Batched resize stage over an already-built media frame (lets
      * callers share one persisted media-record pass across stages). */
    def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.resizeBatch(g, w, h))
      }
    }

    /** Batched frame-sampling stage (one→many: output cardinality is
      * Σ⌈frames/stride⌉, not |media|). */
    def frameSample(media: Dataset[MediaRecord], frameLen: Int, stride: Int): Dataset[SampledFrame] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.frameSampleBatch(g, frameLen, stride))
      }
    }

    /** Batched audio-feature stage. */
    def audio(media: Dataset[MediaRecord], bias: Int): Dataset[AudioFeatures] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.audioFeatureBatch(g, bias))
      }
    }

    /** Batched average-hash stage (empty payloads dropped — no signal
      * to hash). */
    def ahash(media: Dataset[MediaRecord], samples: Int): Dataset[MediaHash] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.ahashBatch(g, samples))
      }
    }

    def phash(media: Dataset[MediaRecord]): Dataset[MediaPHash] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        it.grouped(BatchSize).flatMap(g => FakeCodec.phashBatch(g))
      }
    }

    /** End-to-end: documents → media records → batched decode. */
    def features(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
      import spark.implicits._
      decode(mediaFromDocuments(docs).as[MediaRecord])
    }

    /** End-to-end: documents → media records → batched resize. */
    def resized(spark: SparkSession, docs: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
      import spark.implicits._
      resize(mediaFromDocuments(docs).as[MediaRecord], w, h)
    }

    /** End-to-end: documents → media records → batched frame sampling. */
    def frameSamples(spark: SparkSession, docs: DataFrame, frameLen: Int, stride: Int): Dataset[SampledFrame] = {
      import spark.implicits._
      frameSample(mediaFromDocuments(docs).as[MediaRecord], frameLen, stride)
    }

    /** End-to-end: documents → media records → batched audio features. */
    def audioFeatures(spark: SparkSession, docs: DataFrame, bias: Int): Dataset[AudioFeatures] = {
      import spark.implicits._
      audio(mediaFromDocuments(docs).as[MediaRecord], bias)
    }

    /** End-to-end: documents → media records → batched average-hash
      * signatures. */
    def perceptualHashes(spark: SparkSession, docs: DataFrame, samples: Int): Dataset[MediaHash] = {
      import spark.implicits._
      ahash(mediaFromDocuments(docs).as[MediaRecord], samples)
    }

    def perceptualDctHashes(spark: SparkSession, docs: DataFrame): Dataset[MediaPHash] = {
      import spark.implicits._
      phash(mediaFromDocuments(docs).as[MediaRecord])
    }
  }

  /** One media record's average-hash perceptual signature. */
  case class MediaHash(
      media_id: Long,
      ahash: Long)

  /** One media record's DCT perceptual-hash signature (15 bits). */
  case class MediaPHash(
      media_id: Long,
      phash: Long)

  /** One decoded luma grid (side² unsigned samples, row-major). */
  case class MediaLuma(
      media_id: Long,
      luma: Array[Long])

  /** One resized record: target dims + resampled payload summary. */
  case class ResizedMedia(
      media_id: Long,
      out_w: Int,
      out_h: Int,
      out_len: Long,
      fp_resized: Long)

  /** One sampled frame of a "video" payload. */
  case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      frame_off: Long,
      frame_len: Long,
      frame_fp: Long)

  /** Per-record "audio" features (integer PCM arithmetic). */
  case class AudioFeatures(
      media_id: Long,
      n_samples: Long,
      sum_amp: Long,
      peak_amp: Long,
      zero_crossings: Long)
}
