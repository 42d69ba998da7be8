package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 scoring variants, as pure Catalyst `Column` builders (whole-stage
  * codegen'd for free — no UDF) plus scalar Scala twins used as the in-repo
  * test oracle.
  *
  * Variants and defaults pinned by the reference harness:
  *  - method/k1/b/delta defaults: benchmark/on_bm25s.py:29,34-36
  *  - variant formulas: bm25s paper (arXiv:2407.03618) / Kamphuis et al.,
  *    selected by `method` at benchmark/on_bm25s.py:291-297
  *  - rank_bm25.BM25Okapi second parity target:
  *    benchmark/on_rank_bm25.py:119-122 (epsilon=0.0)
  *
  * "lucene" (the parity target): score = Σ_t idf(t) · tf/(tf + k1·norm),
  * idf = ln(1 + (N−df+0.5)/(df+0.5)), norm = 1−b+b·len/avgdl.
  */
final case class BM25Params(
    k1: Double = 1.5,
    b: Double = 0.75,
    delta: Double = 0.5,
    method: String = "lucene")

object BM25 {

  val Methods = Seq("lucene", "robertson", "atire", "bm25l", "bm25plus", "okapi")

  /** idf(df, N) as a Column (n may be a lit() or a joined column). */
  def idf(method: String, df: Column, n: Column): Column = method match {
    case "lucene" =>
      log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
    case "robertson" =>
      log((n - df + lit(0.5)) / (df + lit(0.5)))
    case "atire" =>
      log(n / df)
    case "bm25l" =>
      log((n + lit(1.0)) / (df + lit(0.5)))
    case "bm25plus" =>
      log((n + lit(1.0)) / df)
    case "okapi" => // rank_bm25.BM25Okapi, epsilon=0.0: negative idf floored at 0
      greatest(log((n - df + lit(0.5)) / (df + lit(0.5))), lit(0.0))
    case m => throw new IllegalArgumentException(s"unknown BM25 method: $m")
  }

  /** Term-frequency component given tf, doc length and avgdl. */
  def tfWeight(p: BM25Params, tf: Column, len: Column, avgdl: Column): Column = {
    val norm = lit(1.0 - p.b) + lit(p.b) * len / avgdl
    p.method match {
      case "lucene" =>
        tf / (tf + lit(p.k1) * norm)
      case "robertson" | "atire" | "okapi" =>
        tf * lit(1.0 + p.k1) / (tf + lit(p.k1) * norm)
      case "bm25l" =>
        val c = tf / norm
        lit(1.0 + p.k1) * (c + lit(p.delta)) / (lit(p.k1) + c + lit(p.delta))
      case "bm25plus" =>
        tf * lit(1.0 + p.k1) / (lit(p.k1) * norm + tf) + lit(p.delta)
      case m => throw new IllegalArgumentException(s"unknown BM25 method: $m")
    }
  }

  /** Per-(term,doc) impact — the eagerly-materialized quantity bm25s stores
    * in its sparse matrix at index time (benchmark/on_bm25s.py:124-129).
    */
  def impact(p: BM25Params, tf: Column, df: Column, len: Column,
             n: Column, avgdl: Column): Column =
    idf(p.method, df, n) * tfWeight(p, tf, len, avgdl)

  // -------- scalar twins (test oracle; plays rank_bm25's role) --------

  object Scalar {
    def idf(method: String, df: Long, n: Long): Double = method match {
      case "lucene" => math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      case "robertson" => math.log((n - df + 0.5) / (df + 0.5))
      case "atire" => math.log(n.toDouble / df)
      case "bm25l" => math.log((n + 1.0) / (df + 0.5))
      case "bm25plus" => math.log((n + 1.0) / df)
      case "okapi" => math.max(math.log((n - df + 0.5) / (df + 0.5)), 0.0)
    }

    def tfWeight(p: BM25Params, tf: Double, len: Long, avgdl: Double): Double = {
      val norm = 1.0 - p.b + p.b * len / avgdl
      p.method match {
        case "lucene" => tf / (tf + p.k1 * norm)
        case "robertson" | "atire" | "okapi" =>
          tf * (1.0 + p.k1) / (tf + p.k1 * norm)
        case "bm25l" =>
          val c = tf / norm
          (1.0 + p.k1) * (c + p.delta) / (p.k1 + c + p.delta)
        case "bm25plus" =>
          tf * (1.0 + p.k1) / (p.k1 * norm + tf) + p.delta
      }
    }

    def impact(p: BM25Params, tf: Double, df: Long, len: Long,
               n: Long, avgdl: Double): Double =
      idf(p.method, df, n) * tfWeight(p, tf, len, avgdl)
  }

  /** In-repo scalar reference engine over a tokenized corpus (plain Scala
    * collections — no Spark). Used by tests exactly the way the reference
    * uses rank_bm25 as an independent implementation. Duplicate query tokens
    * contribute once per occurrence; OOV terms contribute 0 (reference Q1
    * semantics, benchmark/on_bm25s.py:131-150).
    */
  final class ScalarEngine(corpus: Seq[(String, Seq[String])], p: BM25Params,
                           quantizeImpacts: Boolean = false) {
    val n: Long = corpus.size.toLong
    private val lens: Map[String, Long] =
      corpus.map { case (id, toks) => id -> toks.size.toLong }.toMap
    val avgdl: Double =
      if (n == 0) 0.0 else lens.values.sum.toDouble / n
    private val tf: Map[(String, String), Long] = corpus
      .flatMap { case (id, toks) => toks.map(t => (t, id)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    private val df: Map[String, Long] =
      tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    private val postings: Map[String, Seq[String]] =
      tf.keys.toSeq.groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2) }

    def scoreAll(queryTokens: Seq[String]): Map[String, Double] = {
      val acc = scala.collection.mutable.Map.empty[String, Double]
      for (t <- queryTokens; d <- postings.getOrElse(t, Nil)) {
        val s0 = Scalar.impact(p, tf((t, d)).toDouble, df(t), lens(d), n, avgdl)
        // float32 impact quantization mirrors the index's packed-float
        // payload (bm25s likewise stores a float32 score matrix)
        val s = if (quantizeImpacts) s0.toFloat.toDouble else s0
        acc(d) = acc.getOrElse(d, 0.0) + s
      }
      acc.toMap
    }

    /** Top-k with the engine's canonical tie-break (score DESC, docId ASC). */
    def topK(queryTokens: Seq[String], k: Int): Seq[(String, Double)] =
      scoreAll(queryTokens).toSeq
        .sortBy { case (d, s) => (-s, d) }
        .take(k)
  }
}
