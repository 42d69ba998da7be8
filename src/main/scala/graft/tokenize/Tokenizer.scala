package graft.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normative tokenization pipeline, reproducing the reference harness's
  * `utils.tokenize` (reference: utils/__init__.py:56-143) which is the
  * parity target for both the bm25s and rank_bm25 baselines:
  *
  *   T1 lowercase            (utils/__init__.py:82-83)
  *   T2 regex token split    `(?u)\b\w\w+\b` (utils/__init__.py:59)
  *   T3 stopword removal     33-word English list, pre-stemming
  *                           (utils/__init__.py:10-44, 88-90)
  *   T5 snowball stemming    applied to unique tokens only
  *                           (utils/__init__.py:104-126)
  *
  * Everything is expressed as Catalyst `Column` transforms (codegen'd,
  * no Python-style row loop); stemming is a JVM function applied inside a
  * higher-order `transform`, with the distinct-terms-then-join-back rewrite
  * available in IndexBuilder (the reference's stem-unique-only optimization).
  */
object Tokenizer {

  /** Verbatim 33-word English stopword list (utils/__init__.py:10-44). */
  val StopwordsEn: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  private val stopSet: Set[String] = StopwordsEn.toSet

  /** Java analogue of Python `(?u)\b\w\w+\b`: maximal runs of Unicode word
    * chars, length >= 2. `(?U)` turns on UNICODE_CHARACTER_CLASS so `\w`
    * covers letters/digits/underscore beyond ASCII (parity risk for exotic
    * combining marks is documented in SURVEY.md §7.5 — source code payloads
    * are overwhelmingly ASCII).
    */
  val TokenPattern = "(?U)\\w\\w+"

  /** ASCII-only pattern used by the DuckDB-oracle-checked driver queries,
    * where Python/Java/DuckDB regex Unicode classes must not drift.
    */
  val AsciiTokenPattern = "[a-z0-9_]{2,}"

  private def kernel(content: Column, pattern: String,
                     removeStop: Boolean, stem: Boolean): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(graft.tokenize.expr.TokenizeExpr(
      bridge.toExpression(content), pattern, removeStop, stem))
  }

  /** T1+T2: lowercase and split. Returns ArrayType(StringType). All three
    * pipeline entry points compile to ONE native single-pass expression
    * (TokenizeExpr) — the equivalent `filter`/`transform` higher-order
    * Columns are CodegenFallback (interpreted) and dominated the build.
    */
  def splitTokens(content: Column, pattern: String = TokenPattern): Column =
    kernel(content, pattern, removeStop = false, stem = false)

  /** T3: drop stopwords (applied to unstemmed lowercase tokens, as the
    * reference does at utils/__init__.py:88-90).
    */
  def removeStopwords(tokens: Column): Column =
    filter(tokens, t => !t.isInCollection(StopwordsEn))

  /** T1-T3 (no stemming). */
  def tokensNoStem(content: Column, pattern: String = TokenPattern): Column =
    kernel(content, pattern, removeStop = true, stem = false)

  /** Full T1-T5 pipeline: lower, split, stopword-filter, snowball-stem. */
  def tokens(content: Column, pattern: String = TokenPattern): Column =
    kernel(content, pattern, removeStop = true, stem = true)

  /** T1-T3 (+T5 when `stem`) — the stem toggle lets an index pin either
    * pipeline in its properties (IndexBuilder.Config.stem) so the query
    * side always tokenizes identically to the build.
    */
  def tokens(content: Column, pattern: String, stem: Boolean): Column =
    kernel(content, pattern, removeStop = true, stem = stem)

  /** Column-level snowball stem of a single token. */
  def stemCol(token: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(
      graft.tokenize.expr.SnowballStemExpr(bridge.toExpression(token)))
  }

  /** Scalar twin of the full pipeline — the in-repo reference scorer's
    * tokenizer (also the driver-side query tokenizer in QueryEngine's
    * small-batch fast path), behavior-identical to TokenizeExpr: plain
    * collections, no Spark.
    */
  def tokenizeScalar(text: String, stem: Boolean = true): Seq[String] =
    tokenizeScalar(text, TokenPattern, stem)

  def tokenizeScalar(text: String, pattern: String, stem: Boolean): Seq[String] = {
    val re = java.util.regex.Pattern.compile(pattern)
    val m = re.matcher(text.toLowerCase)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val t = m.group()
      if (!stopSet.contains(t)) out += (if (stem) SnowballEnStemmer.stem(t) else t)
    }
    out.result()
  }
}
