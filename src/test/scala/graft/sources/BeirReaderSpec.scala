package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** BEIR-format ingestion (utils/beir.py:96-111 schemas): corpus/queries
  * jsonl with explicit schemas, qrels TSV with header, and the
  * `title + " " + text` content projection (benchmark/on_bm25s.py:57).
  */
class BeirReaderSpec extends SparkTestBase {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("corpus.jsonl: explicit schema, extra fields ignored, content join") {
    val dir = tmpDir("beir-corpus")
    val path = write(dir, "corpus.jsonl",
      """{"_id": "d1", "title": "Binary trees", "text": "A node has children.", "metadata": {"x": 1}}
        |{"_id": "d2", "title": "", "text": "No title doc."}
        |{"_id": "d3", "text": "Missing title field."}
        |""".stripMargin)
    val corpus = BeirReader.readCorpus(spark, path).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2))).toMap
    assert(corpus("d1") == (Some("Binary trees"), "A node has children."))
    assert(corpus("d2") == (Some(""), "No title doc."))
    assert(corpus("d3") == (None, "Missing title field."))

    val content = BeirReader.readCorpusContent(spark, path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(content("d1") == "Binary trees A node has children.")
    // empty/missing title degrades to " " + text — the Python harness's
    // `title + " " + text` with title = "" (benchmark/on_bm25s.py:57)
    assert(content("d2") == " No title doc.")
    assert(content("d3") == " Missing title field.")
  }

  test("queries.jsonl: (qid, query) shape") {
    val dir = tmpDir("beir-queries")
    val path = write(dir, "queries.jsonl",
      """{"_id": "q1", "text": "binary search tree"}
        |{"_id": "q2", "text": "hash join"}
        |""".stripMargin)
    val q = BeirReader.readQueries(spark, path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q == Map("q1" -> "binary search tree", "q2" -> "hash join"))
    assert(BeirReader.readQueries(spark, path).columns.toSeq == Seq("qid", "query"))
  }

  test("qrels tsv: header skipped, int grades, TrecEval-ready names") {
    val dir = tmpDir("beir-qrels")
    val path = write(dir, "test.tsv",
      "query-id\tcorpus-id\tscore\nq1\td1\t2\nq1\td2\t0\nq2\td3\t1\n")
    val qrels = BeirReader.readQrels(spark, path)
    assert(qrels.columns.toSeq == Seq("qid", "docId", "grade"))
    val rows = qrels.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("q1", "d1", 2), ("q1", "d2", 0), ("q2", "d3", 1)))
  }

  test("jsonl round trip feeds the index+query engine end to end") {
    // corpus.jsonl → BeirReader → IndexBuilder → QueryEngine: the ingestion
    // path a reference user would point at real BEIR data
    import spark.implicits._
    val dir = tmpDir("beir-e2e")
    val docs = Seq(
      ("d1", "Trees", "binary search tree insert delete"),
      ("d2", "Maps", "hash map bucket collision probe"),
      ("d3", "Sorts", "merge sort partition pivot quick"))
    docs.toDF("_id", "title", "text").write.json(s"$dir/corpus.jsonl")
    val corpus = BeirReader.readCorpusContent(spark, s"$dir/corpus.jsonl")
      .withColumnRenamed("docId", "docId")
    val idxDir = tmpDir("beir-e2e-idx")
    graft.index.IndexBuilder.build(spark, corpus, idxDir,
      graft.index.IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 4))
    val idx = new graft.query.BM25Index(spark, idxDir)
    val res = graft.query.QueryEngine
      .searchWand(idx, Seq(("q1", "binary tree")).toDF("qid", "query"), 3)
      .collect()
    assert(res.map(_.getString(1)).contains("d1"))
  }
}
