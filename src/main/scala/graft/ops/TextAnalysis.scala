package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Text-analysis operators for a training-data pipeline: language ID
  * (marker-word heuristic), quality scoring (length/punct/stopword ratios),
  * token counting (whitespace + BPE-ish regex), and document fingerprinting
  * (polynomial rolling hash + winnowing). All per-doc scalar pipelines —
  * pure Column expressions except the winnowing fingerprint (a typed UDF
  * over the codepoint sequence).
  */
object TextAnalysis {

  // ---- language ID ------------------------------------------------------

  /** Tiny deterministic marker lexicons (function words that rarely cross
    * languages). A doc scores one point per marker-token occurrence; the
    * highest count wins, 'en' on ties/zero.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "pas", "une"),
    "es" -> Seq("el", "los", "las", "es", "con", "para", "una", "pero"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"))

  /** (lang_pred, score) from a lowercase token array. */
  def langIdCol(tokens: Column): Column = {
    val counts = markers.map { case (lang, ws) =>
      (lang, size(filter(tokens, t => t.isInCollection(ws))))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declared order) achieving the max; 'en' when all 0
    val pred = counts.reverse.foldLeft(lit("en")) { case (acc, (lang, c)) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
    struct(pred.as("lang_pred"), best.cast("long").as("marker_hits"))
  }

  // ---- quality scoring --------------------------------------------------

  /** Per-doc quality features + a composite score in [0,1]:
    * n_chars, n_ws_tokens (\S+ runs), n_alpha_tokens (ASCII token pattern),
    * stopword_ratio, punct_ratio, avg_token_len, quality_score.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              roundTo: Int = 4): DataFrame = {
    val text = col(textCol)
    val ws = regexp_extract_all(text, lit("\\S+"), lit(0))
    val toks = Tokenizer.splitTokens(text, Tokenizer.AsciiTokenPattern)
    val stops = filter(toks, t => t.isInCollection(Tokenizer.StopwordsEn))
    // "punct" = anything that is not alphanumeric or whitespace (ASCII
    // class — identical semantics in Java and DuckDB RE2 for the oracle)
    val nPunct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    docs.select(
      col(idCol).as("id"),
      length(text).cast("long").as("n_chars"),
      size(ws).cast("long").as("n_ws_tokens"),
      size(toks).cast("long").as("n_alpha_tokens"),
      round(when(size(toks) > 0, size(stops).cast("double") / size(toks))
        .otherwise(0.0), roundTo).as("stopword_ratio"),
      round(when(length(text) > 0, nPunct.cast("double") / length(text))
        .otherwise(0.0), roundTo).as("punct_ratio"),
      round(when(size(toks) > 0,
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
        .otherwise(0.0), roundTo).as("avg_token_len"))
      .withColumn("quality_score",
        round(
          when(col("n_ws_tokens") === 0, 0.0).otherwise(
            least(lit(1.0), col("n_ws_tokens").cast("double") / 20.0) *
              (lit(1.0) - col("punct_ratio")) *
              least(lit(1.0), col("avg_token_len") / 4.0)),
          roundTo))
  }

  // ---- token counting ---------------------------------------------------

  /** BPE-ish pre-tokenization pattern: runs of letters, runs of digits,
    * single punctuation/symbols (a simplified GPT-2-style split, ASCII).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
        .cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  // ---- fingerprinting ---------------------------------------------------

  /** Polynomial rolling hash (Karp-Rabin) over the codepoints of a window
    * of `k` chars: h = Σ c_i · B^(k-1-i) mod M, B=257, M=2^61-1.
    */
  val RollB = 257L
  val RollM = (1L << 61) - 1

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit modulus: split multiply via Math.multiplyHigh
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi * 2^64 + lo) mod (2^61 - 1): 2^64 ≡ 8 (mod M)
    var r = (hi % RollM) * 8 % RollM + (lo & RollM) % RollM + (lo >>> 61)
    r %= RollM
    r
  }

  /** All k-gram rolling hashes of a string (scalar twin used in tests). */
  def kgramHashes(s: String, k: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Array.empty
    var pow = 1L
    for (_ <- 1 until k) pow = mulmod(pow, RollB)
    val out = new Array[Long](cps.length - k + 1)
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (mulmod(h, RollB) + cps(i)) % RollM
      if (i >= k) h = (h - mulmod(cps(i - k), mulmod(pow, RollB)) % RollM + RollM) % RollM
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken): minimum k-gram hash
    * in every window of w consecutive k-grams, deduplicated, sorted. Two
    * documents sharing substrings of length ≥ w+k-1 share a fingerprint.
    */
  def winnow(s: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val hs = kgramHashes(s, k)
    if (hs.isEmpty) return Array.empty
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var i = 0
    val n = math.max(hs.length - w + 1, 1)
    while (i < n) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, hs.length)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  private val winnowUdf = udf((s: String, k: Int, w: Int) => winnow(s, k, w))

  /** Winnowing fingerprints per doc: (id, fingerprints ARRAY<LONG>). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
      winnowUdf(lower(col(textCol)), lit(k), lit(w)).as("fingerprints"))

  /** Cheap whole-doc fingerprint usable in oracle-checked queries:
    * first 16 hex chars of md5 of the lowercased text.
    */
  def md5Fingerprint(text: Column): Column =
    substring(md5(lower(text).cast("binary")), 1, 16)

  /** Winnowing fingerprints with the md5 hash family — the SQL-recomputable
    * variant of [[fingerprints]] (same opt-in trade as
    * Dedup.minhashLshMd5): each k-gram hash is the md5 HEX STRING of the
    * k-char substring (string order replaces integer order — well-defined
    * and identical in every engine), window minima / dedup / sort as in
    * Schleimer et al. Declarative Column pipeline: position explode →
    * substr+md5 → per-doc ordered window min — the per-doc window is the
    * cost of SQL recomputability; the rolling-hash UDF family remains the
    * scale default. Docs shorter than k produce no row.
    *
    * Output: (id, fingerprints ARRAY&lt;STRING&gt; sorted distinct minima).
    */
  def fingerprintsMd5(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, w: Int = 4): DataFrame =
    // r7: one native pass per document (WinnowMd5Expr — k-gram md5s, window
    // minima over the window STARTS i ≤ max(nk−w+1, 1), distinct, sorted)
    // instead of position explode + a per-doc ordered window min + a
    // collect_set aggregation, which shuffled and sorted every k-gram row
    // (guide §1.2 step 1). Identical values; docs shorter than k still
    // produce no row.
    docs.select(col(idCol).as("id"), lower(col(textCol)).as("t"))
      .where(length(col("t")) >= k)
      .select(col("id"),
        graft.ops.expr.OpsExprs.winnowMd5(col("t"), k, w).as("fingerprints"))
}
