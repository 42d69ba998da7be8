package graft.query

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.util.SynthCorpus

/** Filtered retrieval (query-time doc predicate, Lucene filter-query
  * semantics): candidates restricted, corpus statistics global. Truth is
  * DERIVED from the unfiltered engine — because stats don't move, the
  * filtered top-k must equal the allowed-subset prefix of a deep
  * unfiltered ranking, doc for doc and score for score. Covered paths:
  * kernel broadcast set (DAAT + TAAT), over-bound semi-join fallback,
  * empty filter.
  */
class FilteredSearchSpec extends SparkTestBase {

  private val k = 10
  private lazy val corpus = SynthCorpus.gen(8, 25) // 200 docs
  private lazy val queries = SynthCorpus.queries

  private lazy val indexDir = {
    val dir = tmpDir("graft-fltidx")
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    IndexBuilder.build(spark, df, dir,
      IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 8))
    dir
  }

  /** ~50% deterministic predicate over the external docId. */
  private val pred = pmod(xxhash64(col("docId")), lit(2)) === 0

  private def collectResults(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .groupBy(_.getString(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getDouble(2))).toSeq
      }

  /** Unfiltered deep ranking → allowed-subset prefix = expected filtered
    * top-k (scores must be IDENTICAL to the unfiltered run's).
    */
  private def derivedTruth(idx: BM25Index,
                           allowed: Set[String]): Map[String, Seq[(String, Double)]] =
    collectResults(QueryEngine.searchExact(idx, queriesDf, corpus.size))
      .map { case (qid, seq) => qid -> seq.filter(d => allowed(d._1)).take(k) }
      .filter(_._2.nonEmpty)

  private lazy val queriesDf = {
    import spark.implicits._
    queries.toDF("qid", "query")
  }

  private def checkEqual(got: Map[String, Seq[(String, Double)]],
                         want: Map[String, Seq[(String, Double)]]): Unit = {
    assert(got.keySet == want.keySet, s"qids ${got.keySet} vs ${want.keySet}")
    for (qid <- want.keySet) {
      val (g, w) = (got(qid), want(qid))
      assert(g.map(_._1) == w.map(_._1), s"$qid docs:\n got=$g\n want=$w")
      g.zip(w).foreach { case ((_, gs), (wd, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"$qid $wd: score $gs vs $ws")
      }
    }
  }

  private def allowedSet(idx: BM25Index): Set[String] =
    idx.docs.where(pred).select("docId").collect().map(_.getString(0)).toSet

  test("filtered wand (DAAT kernel set) matches the derived truth") {
    val idx = new BM25Index(spark, indexDir)
    val allowed = allowedSet(idx)
    assert(allowed.nonEmpty && allowed.size < corpus.size, s"degenerate predicate: ${allowed.size}")
    checkEqual(
      collectResults(QueryEngine.searchWand(idx, queriesDf, k, Some(pred))),
      derivedTruth(idx, allowed))
  }

  test("filtered exact path matches the derived truth") {
    val idx = new BM25Index(spark, indexDir)
    checkEqual(
      collectResults(QueryEngine.searchExact(idx, queriesDf, k, Some(pred))),
      derivedTruth(idx, allowedSet(idx)))
  }

  test("TAAT kernel honors the filter") {
    val idx = new BM25Index(spark, indexDir)
    spark.conf.set("spark.graft.taatMinBatchQueries", "1")
    try checkEqual(
      collectResults(QueryEngine.searchWand(idx, queriesDf, k, Some(pred))),
      derivedTruth(idx, allowedSet(idx)))
    finally spark.conf.unset("spark.graft.taatMinBatchQueries")
  }

  test("over-bound filter falls back to the semi-join path and agrees") {
    val idx = new BM25Index(spark, indexDir)
    spark.conf.set("spark.graft.filterMaxBroadcastDocs", "1")
    try checkEqual(
      collectResults(QueryEngine.searchWand(idx, queriesDf, k, Some(pred))),
      derivedTruth(idx, allowedSet(idx)))
    finally spark.conf.unset("spark.graft.filterMaxBroadcastDocs")
  }

  test("Graft.search forwards the doc filter on both paths") {
    val idx = new BM25Index(spark, indexDir)
    val truth = derivedTruth(idx, allowedSet(idx))
    checkEqual(
      collectResults(graft.Graft.search(idx, queriesDf, k, docFilter = Some(pred))),
      truth)
    checkEqual(
      collectResults(graft.Graft.search(idx, queriesDf, k, exact = true,
        docFilter = Some(pred))),
      truth)
  }

  test("filter selecting no docs returns an empty result with the contract schema") {
    val idx = new BM25Index(spark, indexDir)
    val res = QueryEngine.searchWand(idx, queriesDf, k, Some(lit(false)))
    assert(res.columns.toSeq == Seq("qid", "docId", "score", "rank"))
    assert(res.count() == 0)
  }
}
