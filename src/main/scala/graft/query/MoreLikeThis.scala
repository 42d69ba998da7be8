package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** More-Like-This retrieval: given SEED DOCUMENTS instead of query text,
  * build a weighted query from each seed's highest-signal terms and
  * retrieve its nearest documents — Lucene's MoreLikeThis shape (the
  * harness's Lucene config stores doc vectors for exactly this family of
  * consumers, benchmark/on_pyserini.py:245-253), and the training-pipeline
  * "find documents like these" primitive (seed-based corpus expansion).
  *
  * Per seed doc d: rank the terms of d's STORED doc vector by
  * tf(t, d) · idf(t) with the Lucene idf `ln(1 + (N − df + 0.5)/(df + 0.5))`
  * over the index's exact global df, keep the top `maxTerms`, and run the
  * weighted query through the ordinary engine kernels
  * ([[QueryEngine.searchWandWeighted]]). The seed itself scores like any
  * other document (it normally ranks first — a useful sanity signal);
  * exclude it with a query-time `docFilter` when unwanted.
  *
  * Scale shape: seed vectors come from the pruned docvecs fetch
  * ([[Rm3.feedbackVectors]] — no corpus scan), df for the bounded seed
  * term set comes from the BUCKET-PRUNED postings scan (term pushdown —
  * no vocabulary-wide termstats scan on the common path), the per-seed
  * top-term selection is a WindowGroupLimit-bounded window over ≤ |seed
  * vector| rows, and retrieval is the standard kernel path.
  */
object MoreLikeThis {

  /** Weighted MLT query terms from seed docs: (qid = seed docId, term,
    * qtf = tf·idf weight, rounded to `weightScale` dp when ≥ 0 — the
    * driver-oracle determinism convention for rank-sensitive selection).
    */
  def queryTerms(index: BM25Index, seedDocIds: DataFrame, maxTerms: Int = 25,
                 weightScale: Int = -1): DataFrame = {
    require(maxTerms > 0, "maxTerms must be positive")
    val (docTf, _) = Rm3.feedbackVectors(index, seedDocIds)
    val df = seedTermDf(index, docTf)
    val n = index.numDocs.toDouble
    val idf = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val w0 = docTf.join(df, "term")
      .select(col("docId").as("qid"), col("term"),
        (col("tf").cast("double") * idf).as("qtf"))
    val rounded =
      if (weightScale >= 0) w0.withColumn("qtf", round(col("qtf"), weightScale))
      else w0
    val sel = Window.partitionBy("qid").orderBy(col("qtf").desc, col("term").asc)
    rounded.withColumn("rn", row_number().over(sel))
      .where(col("rn") <= maxTerms && col("qtf") > 0.0)
      .select("qid", "term", "qtf")
  }

  /** Exact global df for the bounded seed term set: a bucket-pruned,
    * term-pushed postings scan (df rides on every posting row) — the same
    * pruning the query path uses, so no vocabulary-wide scan. Falls back
    * to the full termstats table if the term set exceeds the In-literal
    * bound AND the driver-side collect bound.
    */
  private def seedTermDf(index: BM25Index, docTf: DataFrame): DataFrame = {
    val spark = index.spark
    val lim = QueryEngine.maxInTerms(spark)
    val terms = docTf.select("term").distinct().limit(lim + 1).collect()
      .map(_.getString(0))
    if (terms.length <= lim)
      QueryEngine.postingTermDf(index, terms.toSeq)
    else // huge seed set: one narrow termstats scan, hash-joined
      index.termstats.select(col("term"), col("df"))
        .join(docTf.select("term").distinct().hint("shuffle_hash"),
          Seq("term"), "left_semi")
  }

  /** MLT retrieval over a built index: (qid = seed docId, docId, score,
    * rank) — top `k` per seed. `docFilter` composes as in
    * [[QueryEngine.searchWand]] (e.g. exclude the seeds themselves).
    */
  def searchIndexed(index: BM25Index, seedDocIds: DataFrame, k: Int,
                    maxTerms: Int = 25,
                    docFilter: Option[org.apache.spark.sql.Column] = None,
                    weightScale: Int = -1): DataFrame =
    QueryEngine.searchWandWeighted(index,
      queryTerms(index, seedDocIds, maxTerms, weightScale), k, docFilter)
}
