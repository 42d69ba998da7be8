package graft.query

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.score.{BM25, BM25Params}
import graft.tokenize.Tokenizer
import graft.util.SynthCorpus

/** Every §2.6 scoring variant end-to-end: index built with the variant's
  * eager impacts, both physical query paths, checked against the scalar
  * reference engine configured the same way — the cross-backend allclose
  * the reference runs per method (benchmark/on_bm25s.py:291-297,189).
  */
class BM25VariantsSpec extends SparkTestBase {

  private val k = 10
  private lazy val corpus = SynthCorpus.gen(4, 15) // 60 docs
  private lazy val queries = Seq(
    ("v1", "binary search tree"),
    ("v2", "merge merge merge join"), // duplicate query terms
    ("v3", "def class return"),
    ("v4", "the index the scan")) // stopwords mixed in

  for (method <- BM25.Methods) {
    test(s"variant $method: exact + wand match scalar reference") {
      import spark.implicits._
      val p = BM25Params(method = method)
      val dir = tmpDir(s"graft-idx-$method")
      val df = spark.createDataset(corpus).toDF()
        .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
      IndexBuilder.build(spark, df, dir,
        IndexBuilder.Config(params = p, numSegmentGroups = 1, numBuckets = 4))
      val idx = new BM25Index(spark, dir)
      assert(idx.params.method == method) // params round-trip the commit log

      val scalar = new BM25.ScalarEngine(
        corpus.map(sf => sf.docId -> Tokenizer.tokenizeScalar(sf.content)),
        p, quantizeImpacts = true)

      val qdf = queries.toDF("qid", "query")
      for ((path, res) <- Seq(
          "exact" -> QueryEngine.searchExact(idx, qdf, k),
          "wand" -> QueryEngine.searchWand(idx, qdf, k))) {
        val got = res.collect()
          .groupBy(_.getString(0))
          .map { case (qid, rows) =>
            qid -> rows.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getDouble(2))).toSeq
          }
        for ((qid, qtext) <- queries) {
          val expected = scalar.topK(Tokenizer.tokenizeScalar(qtext), k)
          val g = got.getOrElse(qid, Nil)
          assert(g.size == expected.size, s"$method/$path $qid: size")
          g.zip(expected).zipWithIndex.foreach { case (((gd, gs), (ed, es)), r) =>
            assert(math.abs(gs - es) < 1e-4,
              s"$method/$path $qid rank ${r + 1}: $gd=$gs vs $ed=$es")
          }
        }
      }
    }
  }
}
