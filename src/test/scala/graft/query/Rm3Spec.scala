package graft.query

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.util.SynthCorpus

/** RM3 pseudo-relevance feedback: the relevance-model math against a
  * hand-computed fixture, the α=1 degeneration law (pure query model ⇒
  * original ranking preserved), an expansion-recall construction where a
  * document sharing NO original query term enters the top-k only through
  * feedback terms, and weighted-search parity with the text path.
  */
class Rm3Spec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def resultsByQid(df: DataFrame): Map[String, Seq[(String, Double)]] =
    df.collect()
      .groupBy(_.getString(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getDouble(2))).toSeq
      }

  // ---- expandWeights math vs hand computation ---------------------------

  test("expandWeights reproduces the hand-computed relevance model") {
    import spark.implicits._
    // fb: d1 score 2, d2 score 1 (ssum 3); d1 = {apple×2, banana×1} |d1|=3,
    // d2 = {banana×2, cherry×2} |d2|=4; query = {apple} (qsum 1)
    val fb = Seq(("q1", "d1", 2.0), ("q1", "d2", 1.0)).toDF("qid", "doc_id", "score")
    val docTf = Seq(("d1", "apple", 2L), ("d1", "banana", 1L),
      ("d2", "banana", 2L), ("d2", "cherry", 2L)).toDF("doc_id", "term", "tf")
    val dl = Seq(("d1", 3L), ("d2", 4L)).toDF("doc_id", "dl")
    val qtf = Seq(("q1", "apple", 1L)).toDF("qid", "term", "qtf")

    // rm1: apple (2/3)(2/3)=4/9; banana (1/3)(2/3)+(2/4)(1/3)=7/18;
    // cherry (2/4)(1/3)=1/6 — fbTerms=2 keeps apple, banana.
    // α=0.5: apple 0.5·1 + 0.5·4/9 = 13/18; banana 0.5·7/18 = 7/36
    val w = Rm3.expandWeights(fb, docTf, dl, qtf, fbTerms = 2, alpha = 0.5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(w.keySet == Set("apple", "banana"), s"terms: ${w.keySet}")
    assert(math.abs(w("apple") - 13.0 / 18.0) < 1e-12, s"apple ${w("apple")}")
    assert(math.abs(w("banana") - 7.0 / 36.0) < 1e-12, s"banana ${w("banana")}")
  }

  // ---- engine path over a built index ------------------------------------

  private lazy val corpus = SynthCorpus.gen(8, 25) // 200 docs
  private lazy val corpusDf = {
    import spark.implicits._
    spark.createDataset(corpus).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
  }
  private lazy val indexDir = {
    val dir = tmpDir("graft-rm3idx")
    IndexBuilder.build(spark, corpusDf, dir,
      IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 8))
    dir
  }
  private lazy val queriesDf = {
    import spark.implicits._
    SynthCorpus.queries.toDF("qid", "query")
  }

  test("alpha=1 (pure query model) preserves the unexpanded ranking") {
    val idx = new BM25Index(spark, indexDir)
    val base = resultsByQid(QueryEngine.searchWand(idx, queriesDf, 10))
    val rm3 = resultsByQid( // via the facade — same code path as Rm3.searchIndexed
      graft.Graft.searchRm3(idx, queriesDf, 10, fbDocs = 5, fbTerms = 8,
        alpha = 1.0))
    assert(rm3.keySet == base.keySet)
    for (qid <- base.keySet) {
      assert(rm3(qid).map(_._1) == base(qid).map(_._1),
        s"$qid doc order: ${rm3(qid)} vs ${base(qid)}")
      // scores scale by exactly 1/Σqtf per query — ratios must agree
      val ratios = rm3(qid).map(_._2).zip(base(qid).map(_._2)).map(t => t._1 / t._2)
      assert(ratios.forall(r => math.abs(r - ratios.head) < 1e-9),
        s"$qid non-uniform scale: $ratios")
    }
  }

  test("feedback terms retrieve a doc sharing no original query term") {
    import spark.implicits._
    // d1 is the only alpha-match; its mass sits on betafeature, which d2 is
    // all about; fillers keep df stats honest
    val docs = Seq(
      ("d1", "alphakey betafeature betafeature betafeature"),
      ("d2", "betafeature betafeature betafeature gammaload"),
      ("d3", "deltapath epsilonmode zetaflag etaflag"),
      ("d4", "thetaknob iotaknob kappamode lambdapath"),
      ("d5", "gammaload deltapath epsilonmode zetaflag")).toDF("docId", "content")
    val dir = tmpDir("graft-rm3fb")
    IndexBuilder.build(spark, docs, dir,
      IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 2))
    val idx = new BM25Index(spark, dir)
    val q = Seq(("q1", "alphakey")).toDF("qid", "query")

    val base = resultsByQid(QueryEngine.searchWand(idx, q, 5))
    assert(base("q1").map(_._1) == Seq("d1"), s"pass-1: ${base("q1")}")

    val rm3 = resultsByQid(
      Rm3.searchIndexed(idx, q, 5, fbDocs = 1, fbTerms = 2, alpha = 0.5))
    val got = rm3("q1").map(_._1)
    assert(got.contains("d2"), s"expansion did not recall d2: $got")
    assert(got.head == "d1", s"original match must stay on top: $got")
  }

  test("stored doc vectors reproduce the retokenize relevance model exactly") {
    val idx = new BM25Index(spark, indexDir)
    assert(idx.hasDocVectors)
    val stored = resultsByQid(
      Rm3.searchIndexed(idx, queriesDf, 10, fbDocs = 5, fbTerms = 8, alpha = 0.5))
    val retok = resultsByQid(
      Rm3.searchIndexedRetokenize(idx, corpusDf, queriesDf, 10,
        fbDocs = 5, fbTerms = 8, alpha = 0.5))
    assert(stored.keySet == retok.keySet)
    for (qid <- retok.keySet) {
      assert(stored(qid).map(_._1) == retok(qid).map(_._1), s"$qid docs differ")
      stored(qid).zip(retok(qid)).foreach { case ((d, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"$qid $d: $gs vs $ws")
      }
    }
  }

  test("docvec fetch is pruned: salt partition filter + docIntId pushdown, no corpus scan") {
    import spark.implicits._
    val idx = new BM25Index(spark, indexDir)
    val fbIds = corpusDf.select(col("docId")).limit(7)
    val (docTf, _) = Rm3.feedbackVectors(idx, fbIds)
    val plan = docTf.queryExecution.executedPlan.toString
    // partition pruning on the salt dirs reached the scan
    assert(plan.contains("PartitionFilters") && plan.contains("salt"),
      s"no salt partition filter in:\n$plan")
    // the docIntId In-filter is pushed to the parquet row-group stats
    assert(plan.contains("PushedFilters: [In(docIntId"),
      s"docIntId filter not pushed in:\n$plan")
    // nothing in the fetch reads the corpus (only index tables appear)
    assert(!plan.contains("graft-rm3idx-corpus") && !plan.contains("content"),
      s"corpus scan leaked into the docvec fetch:\n$plan")
  }

  test("over-bound docvec-fetch fallbacks (semi-join, broadcast In) stay exact") {
    val idx = new BM25Index(spark, indexDir)
    val want = resultsByQid(
      Rm3.searchIndexed(idx, queriesDf, 10, fbDocs = 5, fbTerms = 8, alpha = 0.5))
    // force the collect bound (driver-heap guard, Rm3.maxPrunedFeedbackDocs)
    // and the In-literal bound (Rm3.maxInIds) in turn — both fallbacks must
    // reproduce the pruned path bit for bit
    for (conf <- Seq("spark.graft.rm3MaxPrunedFeedbackDocs",
                     "spark.graft.docvecMaxInIds")) {
      spark.conf.set(conf, "1")
      try {
        val got = resultsByQid(
          Rm3.searchIndexed(idx, queriesDf, 10, fbDocs = 5, fbTerms = 8, alpha = 0.5))
        assert(got.keySet == want.keySet, s"fallback via $conf: qid set")
        for (qid <- want.keySet) {
          assert(got(qid).map(_._1) == want(qid).map(_._1),
            s"fallback via $conf: $qid doc order")
          // the fallback changes partitioning, hence double-summation order
          // in the relevance model — scores agree to FP-reassociation noise
          got(qid).zip(want(qid)).foreach { case ((d, gs), (_, ws)) =>
            assert(math.abs(gs - ws) < 1e-9, s"$conf $qid $d: $gs vs $ws")
          }
        }
      } finally spark.conf.unset(conf)
    }
  }

  test("searchWandWeighted with integer qtf weights matches the text path") {
    val idx = new BM25Index(spark, indexDir)
    val weighted = queriesDf
      .select(col("qid"),
        explode(graft.tokenize.Tokenizer.tokens(col("query"),
          idx.tokenPattern, idx.stem)).as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).cast("double").as("qtf"))
    val got = resultsByQid(QueryEngine.searchWandWeighted(idx, weighted, 10))
    val want = resultsByQid(QueryEngine.searchWand(idx, queriesDf, 10))
    assert(got.keySet == want.keySet)
    for (qid <- want.keySet) {
      assert(got(qid).map(_._1) == want(qid).map(_._1), s"$qid docs differ")
      got(qid).zip(want(qid)).foreach { case ((d, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"$qid $d: $gs vs $ws")
      }
    }
  }

  test("zero/negative-score feedback carries no relevance mass (no NaN weights)") {
    import spark.implicits._
    // all-zero feedback would be 0/0 without the guard; the negative row
    // (robertson idf regime) must be ignored rather than flip ssum's sign
    val fb = Seq(("q1", "d1", 0.0), ("q1", "d2", -1.5)).toDF("qid", "doc_id", "score")
    val docTf = Seq(("d1", "apple", 2L), ("d2", "pear", 1L)).toDF("doc_id", "term", "tf")
    val dl = Seq(("d1", 2L), ("d2", 1L)).toDF("doc_id", "dl")
    val qtf = Seq(("q1", "apple", 1L)).toDF("qid", "term", "qtf")
    val w = Rm3.expandWeights(fb, docTf, dl, qtf, fbTerms = 4, alpha = 0.5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    // only the query model survives: apple = α·1; nothing NaN, no pear
    assert(w == Map("apple" -> 0.5), s"weights: $w")
  }

  test("negative term weights are rejected before the kernels") {
    import spark.implicits._
    val idx = new BM25Index(spark, indexDir)
    val bad = Seq(("q1", "merge", 1.0), ("q1", "join", -2.0))
      .toDF("qid", "term", "qtf")
    val e = intercept[IllegalArgumentException] {
      QueryEngine.searchWandWeighted(idx, bad, 5).collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("weighted over-chunk path matches the single-collect path") {
    val idx = new BM25Index(spark, indexDir)
    val weighted = queriesDf
      .select(col("qid"),
        explode(graft.tokenize.Tokenizer.tokens(col("query"),
          idx.tokenPattern, idx.stem)).as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).cast("double").as("qtf"))
    val want = resultsByQid(QueryEngine.searchWandWeighted(idx, weighted, 10))
    spark.conf.set("spark.graft.wandQueryChunkRows", "2") // force chunking
    try {
      val got = resultsByQid(QueryEngine.searchWandWeighted(idx, weighted, 10))
      assert(got == want, s"chunked != single-collect:\n$got\nvs\n$want")
    } finally spark.conf.unset("spark.graft.wandQueryChunkRows")
  }

  test("composed driver entry: rows, schema, and OOV/stopword behavior") {
    val df = graft.entry.DriverQueries.bm25TopkRm3(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("qid", "doc_id", "score", "rank"))
    assert(rows.nonEmpty)
    val byQid = rows.groupBy(_.getString(0))
    // OOV query q07 has no feedback docs and no indexed terms: absent
    assert(!byQid.contains("q07"), s"q07 rows: ${byQid.get("q07")}")
    // every present query respects k and rank contiguity
    byQid.foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"$qid ranks: $ranks")
      assert(ranks.size <= 10, s"$qid exceeded k")
    }
    spark.catalog.clearCache() // entry persists are test-scoped
  }
}
