package graft.ops

/** Independent interpreted twins of the native codegen kernels
  * (graft.ops.expr.OpsKernels) and of the rolling-hash winnowing
  * (TextAnalysis.winnow). They exist to emit in-row `twin_ok` cross-check
  * columns on the driver entries whose outputs DuckDB cannot recompute
  * (xxhash64-seeded families): the driver's rows-only check then carries
  * semantics — every emitted row asserts its own agreement with a second
  * implementation, the same role the reference's np.allclose cross-backend
  * asserts play (benchmark/on_bm25s.py:189).
  *
  * The twins share only the HASH PRIMITIVE definition with the kernels
  * (Catalyst xxhash64 seed 42 / the published splitmix64 constants — those
  * ARE the algorithm); everything above it (shingling, signature min-fold,
  * bit votes, window minima) is re-derived in plain collections code.
  */
object TwinChecks {

  /** Catalyst `xxhash64(stringCol)` (seed 42) — the defined hash family. */
  private def xxh64(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  /** splitmix64 finalizer — the published permutation-seed mixer. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Distinct n-gram shingles, first-occurrence order. */
  def shingles(tokens: Seq[String], n: Int): Seq[String] =
    if (tokens.length < n) Seq.empty
    else (0 to tokens.length - n).map(i => tokens.slice(i, i + n).mkString(" ")).distinct

  /** MinHash signature: sig[j] = min over shingles of mix(xxh64(s) ^ mix(j)). */
  def minhashSig(sh: Seq[String], m: Int): Seq[Long] = {
    val sig = Array.fill(m)(Long.MaxValue)
    for (s <- sh) {
      val base = xxh64(s)
      var j = 0
      while (j < m) {
        val h = mix(base ^ mix(j.toLong))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    sig.toSeq
  }

  /** 64-bit SimHash: per-bit ±1 votes of the tokens' xxhash64 bits. */
  def simhash(tokens: Seq[String]): Long =
    (0 until 64).foldLeft(0L) { (acc, b) =>
      val vote = tokens.foldLeft(0) { (v, t) =>
        if (((xxh64(t) >>> b) & 1L) == 1L) v + 1 else v - 1
      }
      if (vote > 0) acc | (1L << b) else acc
    }

  /** Winnowing fingerprints computed WITHOUT the rolling-hash update: each
    * k-gram hash is evaluated directly by Horner's rule mod 2^61−1 (the
    * polynomial TextAnalysis.kgramHashes maintains incrementally), then the
    * same window-min / dedup / sort. Agreement proves the rolling
    * subtract-and-shift arithmetic, the twin's one nontrivial claim.
    */
  def winnowNaive(s: String, k: Int = 8, w: Int = 4): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    def mulmod(a: Long, b: Long): Long = {
      val bi = (BigInt(a) * BigInt(b)) mod BigInt(TextAnalysis.RollM)
      bi.toLong
    }
    val hs = (0 to cps.length - k).map { i =>
      var h = 0L
      var j = 0
      while (j < k) { h = (mulmod(h, TextAnalysis.RollB) + cps(i + j)) % TextAnalysis.RollM; j += 1 }
      h
    }
    val n = math.max(hs.length - w + 1, 1)
    (0 until n).map(i => hs.slice(i, math.min(i + w, hs.length)).min)
      .distinct.sorted
  }
}
