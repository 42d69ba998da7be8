package graft.sources

import graft.SparkTestBase
import graft.ops.Sampling

/** cqadupstack-style merge (utils/beir.py:38-112 semantics) + seeded
  * sampling (on_rank_bm25.py:72-76 contract) + Timer pause/resume.
  */
class CorpusMergeSpec extends SparkTestBase {

  test("merge prefixes ids so cross-corpus collisions stay distinct") {
    import spark.implicits._
    val android = Seq(("1", "how to root"), ("2", "adb fails")).toDF("_id", "text")
    val gis = Seq(("1", "project a raster"), ("9", "wgs84")).toDF("_id", "text")
    val merged = CorpusMerge.merge(Seq("android" -> android, "gis" -> gis))
    val ids = merged.select("_id").collect().map(_.getString(0)).toSet
    assert(merged.count() == 4)
    assert(ids == Set("android_1", "android_2", "gis_1", "gis_9"))
    // non-id columns pass through
    assert(merged.where($"_id" === "gis_1").select("text")
      .head().getString(0) == "project a raster")
  }

  test("qrels merge rewrites BOTH query and corpus ids") {
    import spark.implicits._
    val a = Seq(("q1", "1", 1), ("q2", "2", 2)).toDF("query-id", "corpus-id", "score")
    val b = Seq(("q1", "9", 1)).toDF("query-id", "corpus-id", "score")
    val merged = CorpusMerge.mergeQrels(Seq("android" -> a, "gis" -> b))
    val rows = merged.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(
      ("android_q1", "android_1", 1), ("android_q2", "android_2", 2),
      ("gis_q1", "gis_9", 1)))
  }

  test("seeded sample: deterministic, partition-independent, seed-sensitive") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"query $i")).toDF("qid", "qtext")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.seededSample(d, "qid", 20).collect().map(_.getLong(0)).toSeq
    val s1 = ids(df)
    val s2 = ids(df.repartition(7))
    assert(s1.size == 20 && s1 == s2) // partitioning must not change the sample
    assert(s1.distinct.size == 20)
    val other = Sampling.seededSample(df, "qid", 20, seed = 43L)
      .collect().map(_.getLong(0)).toSeq
    assert(other != s1) // different seed, different sample
  }

  test("Timer accumulates only running spans across pause/resume") {
    val t = new graft.bench.Timer()
    t.start("score")
    Thread.sleep(30)
    t.pause("score")
    val afterPause = t.elapsed("score")
    assert(afterPause >= 0.025, s"expected >=25ms, got $afterPause")
    Thread.sleep(50) // paused: must not count
    assert(t.elapsed("score") == afterPause)
    t.resume("score")
    Thread.sleep(20)
    val total = t.stop("score")
    assert(total >= afterPause + 0.015 && total < afterPause + 0.045 + 0.2,
      s"pause window leaked into elapsed: $total vs $afterPause")
    assert(t.results.contains("score"))
    intercept[IllegalArgumentException](t.elapsed("nope"))
  }
}
