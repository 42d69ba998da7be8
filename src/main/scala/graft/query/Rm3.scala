package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft,
  * SIGIR 2001 relevance models; RM3 interpolation per Abdul-Jaleel et al.,
  * TREC 2004) — the standard companion to BM25 retrieval (Lucene/Anserini's
  * default feedback reranker ships exactly this shape with fbDocs=10,
  * fbTerms=10, originalQueryWeight=0.5).
  *
  * Per query: take the top `fbDocs` documents of a first retrieval pass,
  * estimate the relevance model
  * rm1(w) = Σ_d P(w|d) · score(d)/Σ_d score(d) with P(w|d) = tf(w,d)/|d|,
  * keep the `fbTerms` highest-weight terms, and interpolate with the
  * original query model P(w|q) = qtf(w)/|q|:
  * weight(w) = α·P(w|q) + (1−α)·rm1(w). The expanded weighted query runs a
  * second retrieval pass scoring Σ_w weight(w) · impact(w, d).
  *
  * Scale shape: the relevance model touches only nQueries × fbDocs
  * feedback documents (a semi-join against the corpus + re-tokenize of
  * that bounded set — the stand-in for Lucene's stored doc vectors), the
  * expansion tables are ≤ nQueries × (|q| + fbTerms) rows, and both
  * retrieval passes run the ordinary engine kernels. No stage grows with
  * corpus size beyond the retrieval passes themselves.
  */
object Rm3 {

  /** RM3 interpolated term weights from a feedback run.
    *
    * @param fb     top-fbDocs feedback rows (qid, doc, score) — pass-1
    *               output already cut to the feedback depth; rows with
    *               score ≤ 0 are ignored (no relevance mass, and they
    *               would push ssum toward a 0/0 NaN)
    * @param docTf  (doc, term, tf) term frequencies covering the feedback
    *               docs (a superset is fine; rows join through `fb`)
    * @param dl     (doc, dl) token counts for the same docs
    * @param qtf    (qid, term, qtf) the original tokenized queries
    * @param rm1Scale / weightScale round rm1 and the final weight to this
    *               many dp when ≥ 0 — the driver-oracle determinism
    *               convention (rank-sensitive FP compared across engines is
    *               rounded first); library callers keep full doubles.
    * @return (qid, term, qtf) — `qtf` is the RM3 weight, named for direct
    *         use as [[QueryEngine.searchWandWeighted]] input.
    */
  def expandWeights(fb: DataFrame, docTf: DataFrame, dl: DataFrame,
                    qtf: DataFrame, fbTerms: Int, alpha: Double,
                    docCol: String = "doc_id",
                    rm1Scale: Int = -1, weightScale: Int = -1): DataFrame = {
    require(fbTerms > 0, "fbTerms must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    // only positively-scored feedback docs carry relevance mass: a
    // zero-score doc (possible after the driver's 4-dp rounding) or a
    // negative one (robertson idf) would otherwise drive ssum toward 0 and
    // 0/0 = NaN weights that poison the second pass
    val fbPos = fb.where(col("score") > 0.0)
    val ssum = fbPos.groupBy("qid").agg(sum("score").as("ssum"))
    val pwd = docTf.join(dl, docCol)
      .select(col(docCol), col("term"),
        (col("tf").cast("double") / col("dl")).as("pwd"))
    // score/ssum is NOT factored into a snorm column: (pwd*score)/ssum is
    // the association the SQL oracle twin computes, kept identical here
    val rm1raw = fbPos.join(ssum, "qid").join(pwd, docCol)
      .groupBy("qid", "term")
      .agg(sum(col("pwd") * col("score") / col("ssum")).as("rm1"))
    val rm1 =
      if (rm1Scale >= 0) rm1raw.withColumn("rm1", round(col("rm1"), rm1Scale))
      else rm1raw
    val wSel = Window.partitionBy("qid").orderBy(col("rm1").desc, col("term").asc)
    val fbt = rm1.withColumn("rn", row_number().over(wSel))
      .where(col("rn") <= fbTerms)
      .select("qid", "term", "rm1")
    val qsum = qtf.groupBy("qid").agg(sum("qtf").cast("double").as("qsum"))
    val qm = qtf.join(qsum, "qid")
      .select(col("qid"), col("term"),
        (col("qtf").cast("double") / col("qsum")).as("qm"))
    // full outer: original-only terms keep α·P(w|q), expansion-only terms
    // get (1−α)·rm1 — exactly the RM3 interpolated vocabulary union
    val w0 = qm.join(fbt, Seq("qid", "term"), "full_outer")
      .select(col("qid"), col("term"),
        (lit(alpha) * coalesce(col("qm"), lit(0.0))
          + lit(1.0 - alpha) * coalesce(col("rm1"), lit(0.0))).as("qtf"))
    val rounded =
      if (weightScale >= 0) w0.withColumn("qtf", round(col("qtf"), weightScale))
      else w0
    // zero weights (α=1 expansion terms; sub-half-ulp rounds) contribute 0
    // to every score but still fan candidates into the second pass — drop
    // them (the SQL oracle twin applies the same filter)
    rounded.where(col("qtf") =!= 0.0)
  }

  /** BM25+RM3 over a built index: pass 1 via [[QueryEngine.searchWand]],
    * relevance model from re-tokenizing the ≤ nQueries × fbDocs feedback
    * docs out of `corpus` (docId, content — the same frame the index was
    * built from), pass 2 via [[QueryEngine.searchWandWeighted]]. Both
    * intermediate persists are released before returning (the result rows
    * are already materialized through the weighted pass's collect/spill).
    */
  def searchIndexed(index: BM25Index, corpus: DataFrame, queries: DataFrame,
                    k: Int, fbDocs: Int = 10, fbTerms: Int = 10,
                    alpha: Double = 0.5): DataFrame = {
    require(fbDocs > 0, "fbDocs must be positive")
    val fb = QueryEngine.searchWand(index, queries, fbDocs)
      .select(col("qid"), col("docId"), col("score"))
    fb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fbCorpus = corpus
        .join(fb.select("docId").distinct(), Seq("docId"), "left_semi")
      val toks = fbCorpus.select(col("docId"),
        explode(Tokenizer.tokens(col("content"), index.tokenPattern, index.stem))
          .as("term"))
      toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val docTf = toks.groupBy("docId", "term").agg(count(lit(1)).as("tf"))
        val dlf = toks.groupBy("docId").agg(count(lit(1)).as("dl"))
        val qtf = queries.select(col("qid"),
          explode(Tokenizer.tokens(col("query"), index.tokenPattern, index.stem))
            .as("term"))
          .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))
        val weights = expandWeights(fb, docTf, dlf, qtf, fbTerms, alpha,
          docCol = "docId")
        // the weighted pass collects/spills eagerly, so the returned frame
        // no longer references fb/toks — safe to unpersist in finally
        QueryEngine.searchWandWeighted(index, weights, k)
      } finally toks.unpersist()
    } finally fb.unpersist()
  }
}
