package graft.bench

import graft.SparkTestBase

/** Hand-computed fixtures for the analysis pipeline math
  * (analysis/combine_results.py semantics: qps/dps derivation, mean/std,
  * pivot, baseline normalization, sinks).
  */
class AnalysisSpec extends SparkTestBase {

  private def runs = {
    import spark.implicits._
    Seq(
      // model, dataset, n_queries, n_docs, query_time, index_time, qtok, ctok, threads
      ("graft", "nfcorpus", 100L, 1000L, 4.0, 10.0, 1.0, 10.0, 1),
      ("graft", "nfcorpus", 100L, 1000L, 4.0, 30.0, 1.0, 10.0, 1),
      ("graft", "scifact", 200L, 2000L, 9.0, 20.0, 1.0, 20.0, 1),
      ("rank", "nfcorpus", 100L, 1000L, 49.0, 90.0, 1.0, 10.0, 1),
      ("rank", "scifact", 200L, 2000L, 99.0, 60.0, 1.0, 20.0, 1),
      ("graft", "nfcorpus", 100L, 1000L, 1.0, 1.0, 0.0, 0.0, 8) // multithreaded: dropped
    ).toDF("model", "dataset", "n_queries", "n_docs",
      "query_time", "index_time", "qtok_time", "ctok_time", "n_threads")
  }

  test("throughput derivation + single-thread filter + mean/std") {
    val agg = Analysis.aggregate(
      Analysis.withThroughput(Analysis.singleThreaded(runs)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // graft/nfcorpus: qps = 100/(4+1) = 20 both runs; dps = 1000/20=50 and 1000/40=25
    val g = agg(("graft", "nfcorpus"))
    assert(g.getDouble(2) == 20.0 && g.getDouble(3) == 0.0)
    assert(g.getDouble(4) == 37.5)
    assert(math.abs(g.getDouble(5) - 17.6777) < 1e-3) // std of {50,25}
    // rank/scifact: qps = 200/100 = 2; dps = 2000/80 = 25
    val r = agg(("rank", "scifact"))
    assert(r.getDouble(2) == 2.0 && r.getDouble(4) == 25.0)
  }

  test("model exclusion filter") {
    val kept = Analysis.excludeModels(runs, Seq("rank"))
      .select("model").distinct().collect().map(_.getString(0)).toSet
    assert(kept == Set("graft"))
  }

  test("pivot + normalize by baseline model + markdown sink") {
    val models = Seq("graft", "rank")
    val agg = Analysis.aggregate(
      Analysis.withThroughput(Analysis.singleThreaded(runs)))
    val piv = Analysis.pivotMetric(agg, "qps_mean", models)
    val byDs = piv.collect().map(r => r.getString(0) -> r).toMap
    assert(byDs("nfcorpus").getDouble(1) == 20.0) // graft
    assert(byDs("nfcorpus").getDouble(2) == 2.0)  // rank
    val norm = Analysis.normalizeBy(piv, "rank", models)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(norm("nfcorpus").getDouble(1) == 10.0) // graft 10x rank
    assert(norm("scifact").getDouble(2) == 1.0)
    val md = Analysis.toMarkdown(piv.orderBy("dataset"))
    assert(md.startsWith("| dataset | graft | rank |"))
    assert(md.contains("| nfcorpus | 20.0 | 2.0 |"))
  }

  test("multicore grid: thread filter, abbreviation, quality agg, ES-normalized pivot") {
    import spark.implicits._
    // combine_multicore.py shape: multi-thread runs with quality columns
    val flat = Seq(
      // model, dataset, n_threads, ndcg@10, r@1000, qps, dps
      ("bm25s", "nfcorpus", 4, 0.32, 0.90, 40.0, 400.0),
      ("bm25s", "nfcorpus", 4, 0.32, 0.90, 60.0, 600.0),
      ("elastic-bm25", "nfcorpus", 4, 0.30, 0.88, 25.0, 100.0),
      ("bm25s", "nfcorpus", 1, 0.32, 0.90, 10.0, 100.0) // single-thread: dropped
    ).toDF("model", "dataset", "n_threads", "ndcg@10", "r@1000", "qps", "dps")
    val multi = Analysis.multiThreaded(flat)
    assert(multi.count() == 3)
    val abbr = Analysis.abbreviateModels(multi,
      Map("bm25s" -> "BM25S", "elastic-bm25" -> "ES"))
    val agg = Analysis.aggregateWithQuality(abbr)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(agg.keySet == Set("BM25S", "ES"))
    val b = agg("BM25S")
    assert(b.getAs[Double]("qps") == 50.0 && b.getAs[Double]("dps") == 500.0)
    assert(math.abs(b.getAs[Double]("qps_std") - 14.1421) < 1e-3) // std {40,60}
    assert(b.getAs[Double]("ndcg@10") == 0.32)
    // qps pivot normalized against the ES column (qps_df.div(qps_df["ES"]))
    val models = Seq("BM25S", "ES")
    val piv = Analysis.pivotMetric(
      Analysis.aggregateWithQuality(abbr).withColumnRenamed("qps", "qps_m"),
      "qps_m", models)
    val norm = Analysis.normalizeBy(piv, "ES", models)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(norm("nfcorpus").getDouble(1) == 2.0) // BM25S = 50/25 × ES
    assert(norm("nfcorpus").getDouble(2) == 1.0)
  }

  test("comparisons grid: slice, rescale, multi-index pivot, row avg, latex") {
    import spark.implicits._
    // per-(config, dataset) scores, generate_comparisons.py input shape
    val scores = Seq(
      ("BM25S", 1.5, 0.75, "lucene", "nfcorpus", 0.3181),
      ("BM25S", 1.5, 0.75, "lucene", "scifact", 0.6814),
      ("BM25S", 1.2, 0.75, "robertson", "nfcorpus", 0.3105),
      // robertson/scifact missing -> Avg. must blank for that row
      ("PISA", 1.2, 0.75, "pisa", "nfcorpus", 0.3210),
      ("PISA", 1.2, 0.75, "pisa", "scifact", 0.6900)
    ).toDF("model", "k1", "b", "method", "dataset", "ndcg10")

    val datasets = Seq("nfcorpus", "scifact")
    val sliced = scores.filter($"model" === "BM25S" || $"model" =!= "BM25S") // full set
    val scaled = Analysis.rescalePercent(sliced, Seq("ndcg10"))
    val piv = Analysis.pivotTable(scaled, Seq("k1", "b", "method"),
      "dataset", datasets, "ndcg10")
    val grid = Analysis.withRowAvg(piv, datasets, Seq("k1", "b", "method"))
    val byMethod = grid.collect().map(r => r.getString(2) -> r).toMap
    // lucene: (31.8 + 68.1)/2 = 49.9499... in binary -> 49.9
    assert(byMethod("lucene").getDouble(3) == 49.9)
    assert(byMethod("lucene").getDouble(4) == 31.8)
    assert(byMethod("robertson").isNullAt(3)) // incomplete row -> null Avg.
    val rendered = Analysis.fillMissing(grid, "Avg." +: datasets)
    val rrow = rendered.collect().find(_.getString(2) == "robertson").get
    assert(rrow.getString(3) == "--" && rrow.getString(5) == "--")
    val tex = Analysis.toLatex(rendered.orderBy("method"))
    assert(tex.startsWith("\\begin{tabular}{llllll}"))
    assert(tex.contains("k1 & b & method & Avg. & nfcorpus & scifact \\\\"))
    assert(tex.contains("1.5 & 0.75 & lucene & 49.9 & 31.8 & 68.1 \\\\"))
  }
}
