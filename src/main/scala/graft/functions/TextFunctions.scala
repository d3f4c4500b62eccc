package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality stats, language ID, fingerprints,
  * MinHash and SimHash signatures.
  *
  * Everything here is built from codegen'd built-ins and higher-order
  * functions (`transform`/`aggregate`/`filter`) — no Scala UDFs — so the
  * whole pipeline stays inside WholeStageCodegen and is oracle-checkable
  * where the arithmetic is engine-independent. The hashes used for
  * oracle-checked operators are explicit polynomial hashes (identical
  * IEEE/modular arithmetic in any engine); Spark's murmur3 `hash()` is
  * used only where candidates are later verified exactly (MinHash LSH).
  */
object TextFunctions {

  /** Whitespace tokens. Harness documents are single-space tokenized
    * (FIXTURES.md §2). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-grams (shingles) from a token-array column; empty array
    * when the document has fewer than n tokens (`sequence` would
    * otherwise produce a descending range).
    *
    * IMPORTANT for hot paths: pass a *materialized* token column (a
    * `withColumn`/`select` attribute), not `split(...)` inline —
    * expressions referenced inside a lambda are re-evaluated per
    * element, so an inline split would re-tokenize the document for
    * every `element_at`.
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    when(size(toks) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Convenience form over raw text (fine for tests / small inputs —
    * see the re-evaluation caveat on [[ngramsOfTokens]]). */
  def wordNgrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** Distinct word n-gram set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(wordNgrams(text, n))

  /** Exact Jaccard similarity of two string-array *sets* (arrays must be
    * distinct). Division is a single IEEE op on exact integer counts, so
    * the value is bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** 31-bit polynomial rolling hash over the characters of a string:
    * `h = (h * 31 + code) mod (2^31 - 1)`. Engine-independent modular
    * arithmetic — the document-fingerprint operator, and the token hash
    * underlying the oracle-checked SimHash.
    */
  def polyHash31(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (h, c) => (h * lit(31L) + ascii(c)) % lit(2147483647L))

  /** [[polyHash31]] seeded with a leading space (h₀ = 32 = ascii ' '):
    * the hash of `" " + s` without building the string. Composition
    * helper for multi-token gram hashing. The empty token is special-
    * cased because `split("", "")` yields `[""]` (one empty element,
    * ascii = 0), which would run the fold once and return 992 instead
    * of the seed 32 = H(" ") — the guard keeps the identity
    * H(" " ∘ s) exact for ALL caller inputs, including text with
    * consecutive / leading / trailing spaces. */
  def polyHash31Spaced(s: Column): Column =
    when(length(s) === 0, lit(32L)).otherwise(
      aggregate(split(s, ""), lit(32L),
        (h, c) => (h * lit(31L) + ascii(c)) % lit(2147483647L)))

  /** 31^(len(s)+1) mod (2^31−1) — the factor that shifts an existing
    * poly hash past `" " + s` in the composition identity
    * H(x ∘ y) = H(x)·31^len(y) + H(y) (mod M). Folded over the same
    * char split as the hash so the two stay definitionally aligned —
    * including the same empty-token guard (31¹ = 31, not 31²). */
  def polyShift31Spaced(s: Column): Column =
    when(length(s) === 0, lit(31L)).otherwise(
      aggregate(split(s, ""), lit(31L),
        (acc, _) => (acc * lit(31L)) % lit(2147483647L)))

  /** 31-bit SimHash over whitespace tokens (frequency-weighted: repeated
    * tokens vote repeatedly). Bit b is set iff the sum over tokens of
    * ±1 (+1 when bit b of the token's polyHash31 is set) is > 0.
    * Cost: 31 × n_tokens adds per document, all inside codegen.
    */
  def simhash31(text: Column): Column =
    KernelExpressions.simhashBits(transform(tokens(text), polyHash31(_)), bits = 31)

  /** 62-bit dual-polynomial SimHash: the low 31 bits are [[simhash31]],
    * the high 31 bits the same construction over SALTED token hashes
    * (polyHash31 of "~" + token — an independent hash stream in the
    * same oracle-expressible arithmetic). Near-dup banding over 62
    * bits uses 4 blocks of 15–16 bits (2¹⁵⁺ values each) instead of
    * 31-bit SimHash's 8-bit blocks (256 values) — the bucket
    * saturation that forces the anchor cap on the narrow form arrives
    * ~128× later, which is the production-scale configuration for
    * billion-document corpora. A Hamming threshold over 62 bits is
    * also a sharper near-dup test: unrelated documents sit at ~31
    * expected bit differences instead of ~15.5. */
  def simhash62(text: Column): Column = {
    val toks = tokens(text)
    KernelExpressions.simhashBits(transform(toks, polyHash31(_)), bits = 31) +
      shiftleft(KernelExpressions.simhashBits(
        transform(toks, t => polyHash31(concat(lit("~"), t))), bits = 31), 31)
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** MinHash signature: for each of `perms` universal-hash permutations
    * `h_i(x) = (a_i * x + b_i) mod p`, the minimum over the shingle
    * hashes. Shingles are first mapped to [0, 2^31-1) with the 31-bit
    * polynomial hash ([[KernelExpressions.PolyHashArray]] — engine-
    * independent arithmetic, so the DuckDB oracle can replay candidate
    * generation itself, not just verify the final pair set); the
    * universal-hash family on top smooths any base-hash bias.
    * Coefficients come from a fixed-seed LCG so signatures are
    * deterministic across runs, executors, and engines.
    *
    * Scale: O(perms × shingles) per document, map-side only — no
    * shuffle until the band explode.
    */
  def minhashSignature(shingles: Column, perms: Int = 64): Column = {
    val (as, bs) = minhashCoefficients(perms)
    KernelExpressions.minhashSig(
      KernelExpressions.polyHashArray(shingles), as, bs) // empty set → p sentinel
  }

  /** Deterministic LCG-derived (a, b) coefficient streams (seed fixed so
    * every run and every executor agrees). a must be non-zero mod p. */
  private[graft] def minhashCoefficients(perms: Int): (Array[Long], Array[Long]) = {
    val next = Lcg.stream(seed = 42L)
    val as = Array.fill(perms)(math.max(1L, next() % 2147483647L))
    val bs = Array.fill(perms)(next() % 2147483647L)
    (as, bs)
  }

  /** LSH band hashes: split the signature into `bands` bands of
    * `signature.length / bands` rows and hash each band. Two documents
    * collide in a band iff that band's signature slice matches exactly;
    * with 16 bands × 4 rows, P(collision) = 1-(1-j^4)^16 — ≈1 for
    * j ≥ 0.8, ≈0.04 for j = 0.2.
    *
    * The bucket is a 31-bit polynomial fold of the band's signature
    * rows seeded with the band index — pure long arithmetic inside
    * codegen, and (like the base hash) replayable in the DuckDB oracle.
    * Collisions across DIFFERENT slices only add candidate pairs, which
    * exact verification removes — correctness never depends on the
    * bucket hash being injective.
    */
  def lshBands(signature: Column, perms: Int, bands: Int): Column = {
    val rows = perms / bands
    array((0 until bands).map { j =>
      struct(
        lit(j).as("band"),
        (0 until rows).foldLeft(lit(j.toLong): Column)((acc, r) =>
          (acc * lit(31L) + element_at(signature, j * rows + r + 1)) % lit(2147483647L))
          .as("bucket"))
    }: _*)
  }

  // ---- quality / stats ----

  /** Count of tokens matched by a BPE-ish pre-tokenization regex:
    * letter runs, digit runs, and single non-alphanumeric symbols. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("long")

  /** Ratio of tokens found in `words` (e.g. stopwords). */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(words.map(lit): _*)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Language-specific stopword marker sets for [[langId]]. Kept tiny —
    * this is the classic n-gram/stopword heuristic, not a model. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une"))

  /** Heuristic language ID: count marker-stopword hits per language,
    * pick the max (ties resolved in [[langMarkers]] order — first listed
    * wins). Deterministic, engine-independent.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = langMarkers.map { case (lang, words) =>
      (lang, size(filter(toks, t => t.isin(words.map(lit): _*))))
    }
    val branches = counts.zipWithIndex.init.map { case ((lang, c), i) =>
      val later = counts.drop(i + 1).map(_._2)
      (later.map(oc => c >= oc).reduce(_ && _), lang)
    }
    branches.foldRight(lit(counts.last._1): Column) {
      case ((cond, lang), tail) => when(cond, lit(lang)).otherwise(tail)
    }
  }
}
