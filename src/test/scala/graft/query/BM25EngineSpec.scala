package graft.query

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.score.{BM25, BM25Params}
import graft.tokenize.Tokenizer
import graft.util.SynthCorpus

/** Golden end-to-end parity: Spark index+query (both physical paths) vs the
  * in-repo scalar reference engine — playing the role the rank_bm25 /
  * numpy-vs-numba-vs-jax cross-assertions play in the reference
  * (benchmark/on_bm25s.py:189,207-208, tolerance 1e-6 there; our impacts are
  * float32 like bm25s's score matrix, summed in differing orders across
  * engines, so the tolerance here is 1e-4 on scores with rank-identity
  * checked outside tie groups).
  */
class BM25EngineSpec extends SparkTestBase {

  private val k = 10
  private lazy val corpus = SynthCorpus.gen(8, 25) // 200 docs
  private lazy val queries = SynthCorpus.queries

  private lazy val indexDir = {
    val dir = tmpDir("graft-index")
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    IndexBuilder.build(spark, df, dir,
      IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 8))
    dir
  }

  private lazy val scalar = new BM25.ScalarEngine(
    corpus.map(sf => sf.docId -> Tokenizer.tokenizeScalar(sf.content)),
    BM25Params(), quantizeImpacts = true)

  private lazy val queriesDf = {
    import spark.implicits._
    queries.toDF("qid", "query")
  }

  private def checkAgainstScalar(results: Map[String, Seq[(String, Double)]]): Unit = {
    for ((qid, qtext) <- queries) {
      val expected = scalar.topK(Tokenizer.tokenizeScalar(qtext), k)
      val got = results.getOrElse(qid, Nil)
      assert(got.size == expected.size, s"$qid: size ${got.size} != ${expected.size} ($qtext)")
      // scores match positionally within tolerance
      got.zip(expected).zipWithIndex.foreach { case (((gd, gs), (ed, es)), r) =>
        assert(math.abs(gs - es) < 1e-4,
          s"$qid rank ${r + 1}: score $gs vs $es (doc $gd vs $ed)")
      }
      // docIds rank-identical outside tie groups: compare as sets within
      // groups of equal (rounded) score
      def tieGroups(xs: Seq[(String, Double)]): Seq[Set[String]] =
        xs.groupBy { case (_, s) => math.round(s * 1e6) }.toSeq
          .sortBy(-_._1).map(_._2.map(_._1).toSet)
      assert(tieGroups(got) == tieGroups(expected),
        s"$qid: rank order differs\n got=$got\n exp=$expected")
    }
  }

  private def collectResults(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .groupBy(_.getString(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getDouble(2))).toSeq
      }

  test("exact path matches scalar reference") {
    val idx = new BM25Index(spark, indexDir)
    assert(idx.numDocs == 200)
    val res = QueryEngine.searchExact(idx, queriesDf, k)
    checkAgainstScalar(collectResults(res))
  }

  test("wand path matches scalar reference") {
    val idx = new BM25Index(spark, indexDir)
    val res = QueryEngine.searchWand(idx, queriesDf, k)
    checkAgainstScalar(collectResults(res))
  }

  test("dual-path allclose: exact vs wand agree") {
    val idx = new BM25Index(spark, indexDir)
    val a = collectResults(QueryEngine.searchExact(idx, queriesDf, k))
    val b = collectResults(QueryEngine.searchWand(idx, queriesDf, k))
    assert(a.keySet == b.keySet)
    for (qid <- a.keySet) {
      val (da, db) = (a(qid), b(qid))
      assert(da.size == db.size, s"$qid sizes")
      da.zip(db).foreach { case ((d1, s1), (d2, s2)) =>
        assert(math.abs(s1 - s2) < 1e-6, s"$qid: $d1=$s1 vs $d2=$s2")
      }
    }
  }

  test("k=1000 depth (reference retrieval depth): both paths match scalar") {
    // k far beyond corpus size: result = every matching doc, fully ranked
    val idx = new BM25Index(spark, indexDir)
    import spark.implicits._
    val q = Seq(("qd", "binary search tree"), ("qe", "def class return"))
      .toDF("qid", "query")
    val exact = collectResults(QueryEngine.searchExact(idx, q, 1000))
    val wand = collectResults(QueryEngine.searchWand(idx, q, 1000))
    for ((qid, qtext) <- Seq(("qd", "binary search tree"), ("qe", "def class return"))) {
      val expected = scalar.topK(Tokenizer.tokenizeScalar(qtext), 1000)
      assert(exact(qid).size == expected.size, s"$qid exact size")
      assert(wand(qid).size == expected.size, s"$qid wand size")
      exact(qid).zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-4, s"$qid exact score $gs vs $es")
      }
      wand(qid).zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-4, s"$qid wand score $gs vs $es")
      }
    }
  }

  test("kernel cross-check: WAND and TAAT agree at both depths") {
    // the k>=scoreAllMinK switch picks the TAAT dense-accumulator kernel at
    // depth and WAND for small k; pin the conf both ways so each kernel is
    // exercised in the other's regime and both match the scalar reference
    val idx = new BM25Index(spark, indexDir)
    try {
      spark.conf.set("spark.graft.scoreAllMinK", "1") // force TAAT at k=10
      checkAgainstScalar(collectResults(QueryEngine.searchWand(idx, queriesDf, k)))
      spark.conf.set("spark.graft.scoreAllMinK", "100000") // force WAND at k=1000
      import spark.implicits._
      val q = Seq(("qd", "binary search tree")).toDF("qid", "query")
      val wand = collectResults(QueryEngine.searchWand(idx, q, 1000))
      val expected = scalar.topK(Tokenizer.tokenizeScalar("binary search tree"), 1000)
      assert(wand("qd").size == expected.size)
      wand("qd").zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-4, s"forced-wand score $gs vs $es")
      }
    } finally spark.conf.unset("spark.graft.scoreAllMinK")
  }

  test("chunked large-batch path matches the single-collect path") {
    // force the toLocalIterator streaming path (chunk=3 queries) and the
    // per-task early heap drain (taskHeapMaxRows=1): both must be invisible
    // in the results — finishTopK re-merges early-drained duplicates
    val idx = new BM25Index(spark, indexDir)
    val base = collectResults(QueryEngine.searchWand(idx, queriesDf, k))
    try {
      spark.conf.set("spark.graft.wandQueryChunkRows", "3")
      spark.conf.set("spark.graft.taskHeapMaxRows", "1")
      val chunked = collectResults(QueryEngine.searchWand(idx, queriesDf, k))
      assert(chunked.keySet == base.keySet)
      for (qid <- base.keySet) {
        assert(chunked(qid).map(_._1) == base(qid).map(_._1), s"$qid docs differ")
        chunked(qid).zip(base(qid)).foreach { case ((_, s1), (_, s2)) =>
          assert(math.abs(s1 - s2) < 1e-9, s"$qid scores differ")
        }
      }
    } finally {
      spark.conf.unset("spark.graft.wandQueryChunkRows")
      spark.conf.unset("spark.graft.taskHeapMaxRows")
    }
  }

  test("over-chunk spill derives from the index filesystem, not java.io.tmpdir") {
    // cluster-safety gate: chunk results must land where EVERY node can
    // reach them — under the index dir by default, the conf override when
    // set — never a driver-local temp dir
    val idx = new BM25Index(spark, indexDir)
    // the root DERIVES from the index location (shared by all nodes) —
    // in these local tests indexDir itself is a temp dir, so the gate is
    // the derivation, not the absolute prefix
    assert(QueryEngine.chunkSpillRoot(idx) == s"$indexDir/_tmp-query")
    try {
      spark.conf.set("spark.graft.wandQueryChunkRows", "3")
      assert(QueryEngine.searchWand(idx, queriesDf, k).count() > 0)
      val root = new java.io.File(s"$indexDir/_tmp-query")
      val runs = Option(root.listFiles()).getOrElse(Array.empty)
      assert(runs.nonEmpty, s"no spill run dirs under $root")
      assert(runs.exists(r => Option(r.listFiles()).getOrElse(Array.empty)
        .exists(_.getName.startsWith("chunk-"))), "no chunk dirs in spill run")

      val custom = tmpDir("graft-spill-custom")
      spark.conf.set("spark.graft.chunkSpillDir", custom)
      assert(QueryEngine.chunkSpillRoot(idx) == custom)
      assert(QueryEngine.searchWand(idx, queriesDf, k).count() > 0)
      assert(Option(new java.io.File(custom).listFiles())
        .getOrElse(Array.empty).nonEmpty, s"conf spill dir $custom unused")
    } finally {
      spark.conf.unset("spark.graft.wandQueryChunkRows")
      spark.conf.unset("spark.graft.chunkSpillDir")
    }
  }

  test("deep-k partial emission is bounded by salt-bucket cap, not numSalts") {
    // the scale contract: per query the pre-merge candidate rows are at
    // most min(numSalts, deepKSaltBuckets) × k — independent of how many
    // salts the index has (at 10^12-doc scale numSalts is ~10^6)
    val idx = new BM25Index(spark, indexDir)
    val kk = 7
    try {
      spark.conf.set("spark.graft.scoreAllMinK", "1") // force deep-k mode
      val qArr = QueryEngine.queryChunks(idx, queriesDf, queries.size.toLong).next()
      val perQid = QueryEngine.wandPartials(idx, qArr, kk)
        .groupBy("qidx").count().collect()
      perQid.foreach { r =>
        assert(r.getLong(1) <= math.min(idx.numSalts, 4).toLong * kk,
          s"qidx ${r.getInt(0)}: ${r.getLong(1)} partials > bound")
      }
    } finally spark.conf.unset("spark.graft.scoreAllMinK")
  }

  test("all-stopword and all-OOV queries yield no rows") {
    val idx = new BM25Index(spark, indexDir)
    import spark.implicits._
    val res = QueryEngine.searchExact(idx,
      Seq(("qa", "a the of to"), ("qb", "zzz_oov qqq_missing")).toDF("qid", "query"), k)
    assert(res.count() == 0)
  }

  test("stem=false config: build+query parity vs unstemmed scalar engine") {
    // the no-stem pipeline backs the driver's oracle-checked
    // bm25_topk_indexed entry; properties must pin it so the query side
    // tokenizes identically to the build
    val dir = tmpDir("graft-index-nostem")
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    IndexBuilder.build(spark, df, dir,
      IndexBuilder.Config(stem = false, numSegmentGroups = 1, numBuckets = 8))
    val idx = new BM25Index(spark, dir)
    assert(!idx.stem && idx.props("stemmer") == "none")
    val scalarNoStem = new BM25.ScalarEngine(
      corpus.map(sf => sf.docId -> Tokenizer.tokenizeScalar(sf.content, stem = false)),
      BM25Params(), quantizeImpacts = true)
    val results = collectResults(QueryEngine.searchWand(idx, queriesDf, k))
    for ((qid, qtext) <- queries) {
      val expected = scalarNoStem.topK(Tokenizer.tokenizeScalar(qtext, stem = false), k)
      val got = results.getOrElse(qid, Nil)
      assert(got.size == expected.size, s"$qid: size ${got.size} != ${expected.size}")
      got.zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-4, s"$qid: $gs vs $es")
      }
    }
  }

  test("empty corpus: build completes, both paths return zero rows") {
    val dir = tmpDir("graft-index-empty")
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("docId", "content")
    IndexBuilder.build(spark, empty, dir,
      IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 4))
    val idx = new BM25Index(spark, dir)
    assert(idx.numDocs == 0)
    val q = Seq(("q1", "binary search")).toDF("qid", "query")
    assert(QueryEngine.searchWand(idx, q, 5).count() == 0)
    assert(QueryEngine.searchExact(idx, q, 5).count() == 0)
  }

  test("index stats and properties recorded") {
    val idx = new BM25Index(spark, indexDir)
    assert(idx.params == BM25Params())
    assert(idx.avgdl > 0)
    assert(idx.props("stemmer") == "snowball-en")
    // per-partition lineage present
    val commits = idx.store.readCommits()
    assert(commits.map(_.group).toSet
      .intersect(Set("docmap", "seg-0", "seg-1", "docs", "postings")).size == 5)
  }
}
