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
  * feedback documents, fetched from the index's STORED doc vectors with
  * salt-partition + docIntId row-group pruning (the Lucene
  * `--storeDocvectors` design, benchmark/on_pyserini.py:245-253), the
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

  /** Max feedback-doc rows collected to the driver to drive docvec
    * partition/row-group pruning; beyond it the fetch degrades to a
    * distributed semi-join (exact, no pruning). nQueries × fbDocs stays
    * far below this for any sane batch (a 10k-query batch at fbDocs=10 is
    * 100k rows).
    *
    * Driver-heap sizing rule: each collected row is a boxed (long, int)
    * Row, ~48-64 bytes on-heap — the default 2^18 bound caps the collect
    * at ~16 MB of transient driver heap. Raise
    * `spark.graft.rm3MaxPrunedFeedbackDocs` only with driver memory to
    * match (~64 bytes/row); the over-bound fallback stays exact, it just
    * loses row-group pruning.
    */
  def maxPrunedFeedbackDocs(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.rm3MaxPrunedFeedbackDocs")
      .map(_.toInt).getOrElse(1 << 18)

  /** Max feedback-doc ids carried as a literal In/InSet filter into the
    * docvecs scan (row-group pruning); larger sets use a broadcast
    * semi-join over the salt-pruned partitions instead.
    */
  def maxInIds(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.docvecMaxInIds")
      .map(_.toInt).getOrElse(1 << 16)

  /** Fetch stored doc vectors for a bounded feedback doc set from the
    * index's docvecs table (the consumer Pyserini stores doc vectors for,
    * benchmark/on_pyserini.py:245-253).
    *
    * @param fbDocIds frame with a `docId` column (duplicates fine),
    *                 ≤ nQueries × fbDocs rows by construction
    * @return (docTf (docId, term, tf), dl (docId, dl)) — keyed by the
    *         corpus docId string, ready for [[expandWeights]].
    *
    * Scale shape: the doc set resolves against the cached docs dimension,
    * its (docIntId, salt) pairs are collected (bounded — see
    * `maxPrunedFeedbackDocs`), and the docvecs scan is pruned to the
    * matching salt PARTITIONS with a docIntId In-filter pushed to the
    * row-group stats (files are docIntId-sorted). No stage scans the
    * corpus or the full token table; at In-literal-unfriendly sizes the id
    * filter becomes a broadcast semi-join (partition pruning retained).
    */
  def feedbackVectors(index: BM25Index, fbDocIds: DataFrame): (DataFrame, DataFrame) = {
    val spark = index.spark
    if (index.numDocs == 0) {
      // an empty build leaves a schemaless docvecs dir — short-circuit with
      // correctly-typed empty frames instead of a failing parquet read
      import spark.implicits._
      return (Seq.empty[(String, String, Long)].toDF("docId", "term", "tf"),
        Seq.empty[(String, Long)].toDF("docId", "dl"))
    }
    val dim = index.docs
      .join(broadcast(fbDocIds.select("docId").distinct()), Seq("docId"))
      .select(col("docId"), col("docIntId"), col("salt"), col("len"))
    val dl = dim.select(col("docId"), col("len").as("dl"))
    val bound = maxPrunedFeedbackDocs(spark)
    val lim = math.min(bound.toLong + 1L, Int.MaxValue.toLong).toInt
    val rows = dim.select(col("docIntId"), col("salt")).limit(lim).collect()
    val pruned =
      if (rows.length > bound) // over-bound: exact distributed fallback
        index.docvecs.join(dim.select("docIntId").hint("shuffle_hash"),
          Seq("docIntId"), "left_semi")
      else {
        val ids = rows.map(_.getLong(0))
        val salts = rows.map(_.getInt(1)).distinct.toSeq
        val bySalt = index.docvecs.where(col("salt").isInCollection(salts))
        // long-id In/InSet filters stay cheap far beyond the string-term
        // In bound, and reaching the scan matters: the id filter prunes
        // row groups of the docIntId-sorted files (measured ~2% of
        // records read), while the semi-join fallback scans every
        // surviving salt partition in full
        if (ids.length <= maxInIds(spark))
          bySalt.where(col("docIntId").isInCollection(ids.toSeq))
        else {
          import spark.implicits._
          bySalt.join(broadcast(ids.toSeq.toDF("docIntId")),
            Seq("docIntId"), "left_semi")
        }
      }
    // unpack AFTER pruning: the packed layout (one row per doc — terms[],
    // tfs[]) keeps partition + row-group pruning on ~numDocs rows, and only
    // the ≤ nQueries × fbDocs surviving vectors explode back to (term, tf)
    // pairs. A doc split across input-split boundaries at build time yields
    // two partial rows whose pairs union here — each (doc, term) exists
    // exactly once globally, so the result is identical.
    val unpacked =
      if (index.docvecsFormat == "packed")
        pruned.select(col("docIntId"),
          explode(arrays_zip(col("terms"), col("tfs"))).as("tt"))
          .select(col("docIntId"), col("tt.terms").as("term"),
            col("tt.tfs").as("tf"))
      else pruned // legacy row-per-(doc,term) layout
    val docTf = unpacked
      .join(broadcast(dim.select("docIntId", "docId")), "docIntId")
      .select(col("docId"), col("term"), col("tf"))
    (docTf, dl)
  }

  /** BM25+RM3 over a built index: pass 1 via [[QueryEngine.searchWand]],
    * relevance model from the index's STORED doc vectors (a pruned fetch of
    * the ≤ nQueries × fbDocs feedback vectors — see [[feedbackVectors]]; no
    * corpus scan, no re-tokenization), pass 2 via
    * [[QueryEngine.searchWandWeighted]]. The feedback persist is released
    * before returning (the weighted pass materializes eagerly). Requires an
    * index built with `storeDocVectors` (the default); for legacy indexes
    * without doc vectors use [[searchIndexedRetokenize]].
    *
    * `docFilter` applies to BOTH passes (Lucene filter+feedback semantics:
    * the relevance model is estimated from allowed docs only, and the
    * expanded query ranks within the allowed set).
    */
  def searchIndexed(index: BM25Index, queries: DataFrame,
                    k: Int, fbDocs: Int = 10, fbTerms: Int = 10,
                    alpha: Double = 0.5,
                    docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(fbDocs > 0, "fbDocs must be positive")
    val fb = QueryEngine.searchWand(index, queries, fbDocs, docFilter)
      .select(col("qid"), col("docId"), col("score"))
    fb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (docTf, dl) = feedbackVectors(index, fb.select("docId"))
      val weights = expandWeights(fb, docTf, dl, queryTf(index, queries),
        fbTerms, alpha, docCol = "docId")
      // the weighted pass collects/spills eagerly, so the returned frame
      // no longer references fb — safe to unpersist in finally
      QueryEngine.searchWandWeighted(index, weights, k, docFilter)
    } finally fb.unpersist()
  }

  private def queryTf(index: BM25Index, queries: DataFrame): DataFrame =
    queries.select(col("qid"),
      explode(Tokenizer.tokens(col("query"), index.tokenPattern, index.stem))
        .as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))

  /** [[searchIndexed]] for indexes built WITHOUT stored doc vectors: the
    * relevance model re-tokenizes the feedback docs out of `corpus`
    * (docId, content — the same frame the index was built from) through a
    * bounded semi-join. Exact and one-pass, but the semi-join reads the
    * corpus table once per batch — prefer building with doc vectors.
    */
  def searchIndexedRetokenize(index: BM25Index, corpus: DataFrame,
                              queries: DataFrame, k: Int, fbDocs: Int = 10,
                              fbTerms: Int = 10, alpha: Double = 0.5): DataFrame = {
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
        val weights = expandWeights(fb, docTf, dlf, queryTf(index, queries),
          fbTerms, alpha, docCol = "docId")
        // the weighted pass collects/spills eagerly, so the returned frame
        // no longer references fb/toks — safe to unpersist in finally
        QueryEngine.searchWandWeighted(index, weights, k)
      } finally toks.unpersist()
    } finally fb.unpersist()
  }
}
