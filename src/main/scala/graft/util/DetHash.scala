package graft.util

/** Deterministic, partition-independent hashing used everywhere randomness
  * is needed. The reference fixes a global seed (settings.py:13-18, seed 37);
  * under distributed execution a global RNG is not reproducible, so all
  * "randomness" here is content-derived: splitmix64 over (seed, inputs).
  * Identical results at any parallelism level — required for the N vs 4N
  * determinism gate (SURVEY.md §7.5 item 2). */
object DetHash {
  /** splitmix64 finalizer — public-domain algorithm (Steele et al.). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def h1(seed: Long, a: Long): Long = mix64(seed ^ mix64(a))
  def h2(seed: Long, a: Long, b: Long): Long = mix64(h1(seed, a) ^ mix64(b + 0x632be59bd9b4e019L))
  def h3(seed: Long, a: Long, b: Long, c: Long): Long = mix64(h2(seed, a, b) ^ mix64(c + 0x9e3779b97f4a7c15L))

  /** Deterministic 64-bit hash of a string (FNV-1a over UTF-16 code units,
    * then splitmix64 finalize). Stable across JVMs — never uses
    * String.hashCode semantics beyond spec, but we avoid relying on it. */
  def strHash(s: String, seed: Long = 0L): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Uniform double in [0,1) from a hash. */
  @inline def toUnit(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16

  @inline def nonNeg(h: Long): Long = h & Long.MaxValue
}
