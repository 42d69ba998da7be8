package graft.query

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.util.SynthCorpus

/** More-Like-This over stored doc vectors: self-retrieval sanity, term-cut
  * bounds, doc-filter composition (seed exclusion), and the driver entry's
  * shape.
  */
class MoreLikeThisSpec extends SparkTestBase {

  private lazy val corpusDf = {
    import spark.implicits._
    spark.createDataset(SynthCorpus.gen(8, 25)).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
  }
  private lazy val indexDir = {
    val dir = tmpDir("graft-mltidx")
    IndexBuilder.build(spark, corpusDf, dir,
      IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 8))
    dir
  }

  test("each seed retrieves itself first; weighted query is term-capped") {
    import spark.implicits._
    val idx = new BM25Index(spark, indexDir)
    val seeds = corpusDf.select("docId").limit(4)
    val seedIds = seeds.collect().map(_.getString(0)).toSet
    val wq = MoreLikeThis.queryTerms(idx, seeds, maxTerms = 10)
    val perSeed = wq.groupBy("qid").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSeed.keySet == seedIds)
    assert(perSeed.values.forall(n => n > 0 && n <= 10), s"$perSeed")
    // tf·idf weights are positive and the cut keeps the heaviest ones
    assert(wq.where(col("qtf") <= 0.0).isEmpty)

    val res = MoreLikeThis.searchIndexed(idx, seeds, k = 5, maxTerms = 10)
      .collect().groupBy(_.getString(0))
    for (sid <- seedIds) {
      val top = res(sid).minBy(_.getInt(3))
      assert(top.getString(1) == sid, s"seed $sid did not rank itself first: $top")
    }
  }

  test("docFilter composes: seeds excluded from their own results") {
    import spark.implicits._
    val idx = new BM25Index(spark, indexDir)
    val seeds = corpusDf.select("docId").limit(3)
    val seedIds = seeds.collect().map(_.getString(0)).toSet
    val res = MoreLikeThis.searchIndexed(idx, seeds, k = 5, maxTerms = 10,
      docFilter = Some(!col("docId").isInCollection(seedIds)))
      .collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(!seedIds.contains(r.getString(1)),
      s"seed leaked into filtered MLT results: $r"))
  }

  test("composed driver entry: schema, seeds present, rank contiguity") {
    val df = graft.entry.DriverQueries.bm25Mlt(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("qid", "doc_id", "score", "rank"))
    val byQid = rows.groupBy(_.getString(0))
    assert(byQid.keySet == Set("m3", "m10", "m17"))
    byQid.foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"$qid ranks: $ranks")
      // the seed ranks itself first (self-similarity sanity)
      assert(rs.minBy(_.getInt(3)).getLong(1).toString == qid.drop(1),
        s"$qid top doc: ${rs.minBy(_.getInt(3))}")
    }
    spark.catalog.clearCache()
  }
}
