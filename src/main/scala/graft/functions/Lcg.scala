package graft.functions

/** Shared deterministic pseudo-random stream (MMIX LCG constants,
  * Knuth, public domain). Single source of truth for every seeded
  * coefficient family in the engine — MinHash permutations, LSH
  * hyperplanes — so reproducibility guarantees can't drift apart.
  */
object Lcg {
  /** Returns a closure producing the 31-bit-ish stream for `seed`. */
  def stream(seed: Long): () => Long = {
    var state = seed
    () => {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 33
    }
  }
}
